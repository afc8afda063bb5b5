"""Multi-host initialization and cross-process utilities.

The reference's multi-node story is Lightning env-rendezvous + NCCL
(conf/trainer.py:14, SURVEY.md section 5.8).  TPU-native: each host runs the
same program; ``jax.distributed.initialize()`` wires the slice, ``Mesh`` spans
all devices (ICI within a slice, DCN across slices), and jit's partitioner
inserts the collectives.  Logging/checkpointing are process-0-only.
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (no-op on single-process runs).

    With TPU metadata available (GKE/GCE), bare ``jax.distributed.initialize()``
    autodiscovers everything; args are for manual rendezvous.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # already initialized or single-host environment
        pass


def is_primary() -> bool:
    """True on the logging/checkpointing process (reference @rank_zero_only)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch size for a host-sharded data pipeline."""
    n = jax.process_count()
    if global_batch % n:
        msg = f"global batch {global_batch} not divisible by {n} processes."
        raise ValueError(msg)
    return global_batch // n
