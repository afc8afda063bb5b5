"""Chunked date-reduce in PixelifyHead: scan slices == unchunked result."""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.models.heads import PixelifyHead


def test_chunked_reduce_matches_unchunked(monkeypatch):
    b, d, l, c = 2, 5, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, d, l, c), jnp.float32)
    head = PixelifyHead(type_head="attentive", dim=c, num_classes=7,
                        patch_size=4, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(1), x)
    ref = jax.jit(head.apply)(params, x)

    # force chunking (fp32 input is ~40 KB; cap at 4 KB -> multiple slices)
    monkeypatch.setattr(PixelifyHead, "_CHUNK_BYTES", 4096)
    chunked_head = PixelifyHead(type_head="attentive", dim=c, num_classes=7,
                                patch_size=4, dtype=jnp.float32)
    out = jax.jit(chunked_head.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients flow identically through the scanned reduce
    g_ref = jax.jit(jax.grad(lambda p: jnp.sum(head.apply(p, x) ** 2)))(params)
    g_chk = jax.jit(jax.grad(lambda p: jnp.sum(chunked_head.apply(p, x) ** 2)))(params)
    for (ka, a), (kb, bb) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_chk)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))


def test_resize_matrix_matches_jax_image():
    import jax.image as jax_image

    from maestro_tpu.models.heads import resize_matrix

    for g, G in [(5, 32), (8, 16), (16, 16), (3, 7)]:
        x = jax.random.normal(jax.random.PRNGKey(g), (g, g), jnp.float32)
        a = resize_matrix(g, G)
        want = jax_image.resize(x, (G, G), "linear")
        got = a @ x @ a.T
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_chunked_seg_head_matches_pixelify_path():
    """ChunkedSegHead == PixelifyHead(concat(resize_token_grid(x)))."""
    from maestro_tpu.models.heads import ChunkedSegHead
    from maestro_tpu.ops.resize import resize_token_grid

    ref_grid, patch, k, c = 8, 4, 7, 32
    mod_grids = (8, 4, 2)
    dgs = (1, 3, 5)
    b = 2
    key = jax.random.PRNGKey(0)
    xs = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (b, dg, g * g, c),
                          jnp.float32)
        for i, (g, dg) in enumerate(zip(mod_grids, dgs))
    )

    chunked = ChunkedSegHead(
        type_head="attentive", dim=c, num_classes=k, patch_size=patch,
        ref_grid=ref_grid, mod_grids=mod_grids, chunk_rows=2,
        dtype=jnp.float32,
    )
    params = chunked.init(jax.random.PRNGKey(1), xs)

    ref_head = PixelifyHead(type_head="attentive", dim=c, num_classes=k,
                            patch_size=patch, dtype=jnp.float32)
    x_ref = jnp.concatenate(
        [resize_token_grid(x, ref_grid, "bilinear") for x in xs], axis=1,
    )
    want = jax.jit(ref_head.apply)(params, x_ref)  # same param tree by construction
    got = jax.jit(chunked.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # mean-pool variant
    chunked_m = ChunkedSegHead(
        type_head="linear", dim=c, num_classes=k, patch_size=patch,
        ref_grid=ref_grid, mod_grids=mod_grids, chunk_rows=2,
        dtype=jnp.float32,
    )
    pm = chunked_m.init(jax.random.PRNGKey(2), xs)
    ref_m = PixelifyHead(type_head="linear", dim=c, num_classes=k,
                         patch_size=patch, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(chunked_m.apply)(pm, xs)),
        np.asarray(jax.jit(ref_m.apply)(pm, x_ref)), atol=1e-4,
    )


def test_chunked_seg_head_unroll_invariant():
    """scan unroll is a pure scheduling knob: outputs and grads match
    unroll=1 bitwise-shape-wise and numerically to fp32 tolerance; a
    non-divisor unroll silently falls back to the plain loop."""
    from maestro_tpu.models.heads import ChunkedSegHead

    ref_grid, patch, k, c = 8, 4, 7, 32
    mod_grids = (8, 4)
    xs = tuple(
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(0), i),
                          (2, dg, g * g, c), jnp.float32)
        for i, (g, dg) in enumerate(zip(mod_grids, (3, 5)))
    )

    def build(unroll):
        return ChunkedSegHead(
            type_head="attentive", dim=c, num_classes=k, patch_size=patch,
            ref_grid=ref_grid, mod_grids=mod_grids, chunk_rows=2,
            unroll=unroll, dtype=jnp.float32,
        )

    params = build(1).init(jax.random.PRNGKey(1), xs)
    want = jax.jit(build(1).apply)(params, xs)
    g_ref = jax.jit(
        jax.grad(lambda p: jnp.sum(build(1).apply(p, xs) ** 2)))(params)
    for unroll in (2, 4, 3):  # 3 does not divide n=4 -> fallback path
        got = jax.jit(build(unroll).apply)(params, xs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        g = jax.jit(
            jax.grad(lambda p: jnp.sum(build(unroll).apply(p, xs) ** 2)),
        )(params)
        for (ka, a), (_, bb) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=1e-4,
                err_msg=f"unroll={unroll} {jax.tree_util.keystr(ka)}")
