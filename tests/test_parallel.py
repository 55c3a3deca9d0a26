"""Sharded-execution tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P_

from opencl_fft_tpu.ops import pconv as P
from opencl_fft_tpu.parallel import sharded
from opencl_fft_tpu.parallel.mesh import balanced_shape, make_mesh

RNG = np.random.default_rng(11)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _put_state(state, mesh):
    sh = sharded.state_shardings(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in state.items()}


def test_balanced_shape():
    assert balanced_shape(8) == (2, 4)
    assert balanced_shape(4) == (2, 2)
    assert balanced_shape(7) == (1, 7)
    assert balanced_shape(1) == (1, 1)


def test_sharded_fft_matches_local():
    mesh = make_mesh((8, 1))
    x = RNG.standard_normal((16, 256)).astype(np.float32)
    xi = RNG.standard_normal((16, 256)).astype(np.float32)
    re, im = sharded.sharded_fft(
        (jax.device_put(x, NamedSharding(mesh, P_("dp", None))),
         jax.device_put(xi, NamedSharding(mesh, P_("dp", None)))), mesh)
    ref = np.fft.fft(x + 1j * xi)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.max(np.abs(ref)), rtol=0)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sharded_lti_matches_unsharded(shape):
    mesh = make_mesh(shape)
    pts, nparts = 32, 8
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    batch = 8                       # divisible by every dp in the param list
    ir = RNG.standard_normal((batch, cfg.cvs)).astype(np.float32)

    state = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
    ir_dev = jax.device_put(jnp.asarray(ir), NamedSharding(mesh, P_("dp", None)))
    state = sharded.sharded_push_ir(cfg, mesh, state, ir_dev)
    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=False)

    refs = [P.push_ir(cfg, P.pconv_init(cfg), ir[b]) for b in range(batch)]
    for _ in range(2 * nparts):
        blocks = RNG.standard_normal((batch, pts)).astype(np.float32)
        state, out = step(state, blocks)
        expect = []
        for b in range(batch):
            refs[b], o = P.pconv_step(cfg, refs[b], blocks[b])
            expect.append(np.asarray(o))
        np.testing.assert_allclose(np.asarray(out), np.stack(expect),
                                   atol=1e-4, rtol=0)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sharded_lti_deployment_shape(shape):
    """Deployment-scale sharding (VERDICT r2 #6): the headline config —
    pts=512, nparts=256 (2^17-tap IR), batch=8 — must compile and match
    the single-device engine on every mesh factorization, not just the
    toy pts=32/nparts=8 shapes."""
    mesh = make_mesh(shape)
    pts, nparts, batch = 512, 256, 8
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    ir = (RNG.standard_normal((batch, cfg.cvs)) * 0.05).astype(np.float32)

    state = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
    ir_dev = jax.device_put(jnp.asarray(ir), NamedSharding(mesh, P_("dp", None)))
    state = sharded.sharded_push_ir(cfg, mesh, state, ir_dev)
    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=False)

    refs = [P.push_ir(cfg, P.pconv_init(cfg), ir[b]) for b in range(batch)]
    for _ in range(2):
        blocks = RNG.standard_normal((batch, pts)).astype(np.float32)
        state, out = step(state, blocks)
        expect = []
        for b in range(batch):
            refs[b], o = P.pconv_step(cfg, refs[b], blocks[b])
            expect.append(np.asarray(o))
        scale = np.max(np.abs(np.stack(expect))) + 1e-9
        np.testing.assert_allclose(np.asarray(out), np.stack(expect),
                                   atol=1e-4 * scale, rtol=0)


def test_sharded_tv_matches_unsharded():
    mesh = make_mesh((2, 4))
    pts, nparts = 16, 8
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    batch = 2
    state = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=True)
    refs = [P.pconv_init(cfg) for _ in range(batch)]
    for _ in range(2 * nparts + 3):
        bx = RNG.standard_normal((batch, pts)).astype(np.float32)
        bh = RNG.standard_normal((batch, pts)).astype(np.float32)
        state, out = step(state, bx, bh)
        expect = []
        for b in range(batch):
            refs[b], o = P.pconv_step_tv(cfg, refs[b], bx[b], bh[b])
            expect.append(np.asarray(o))
        np.testing.assert_allclose(np.asarray(out), np.stack(expect),
                                   atol=1e-4, rtol=0)


def test_nparts_must_divide_tp():
    mesh = make_mesh((2, 4))
    cfg = P.PconvConfig.for_ir_length(32 * 6, 32)   # nparts=6, tp=4
    with pytest.raises(ValueError):
        sharded.make_sharded_pconv_step(cfg, mesh)


def test_dryrun_multichip_entry():
    """The driver-facing dry run must work on the virtual mesh."""
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    state, out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape


def test_dist_serving_demo_runs():
    """The distributed-serving example passes its own cross-check on the
    virtual mesh (same in-process import pattern as the graft entry)."""
    import importlib.util
    import pathlib
    path = (pathlib.Path(__file__).resolve().parent.parent / "examples"
            / "dist_serving_demo.py")
    spec = importlib.util.spec_from_file_location("dist_serving_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rel = mod.run(channels=8, nblocks=12, pts=32, nparts=8, verbose=False)
    assert rel <= 3e-5


def test_sharded_step_bitwise_reproducible():
    """Sharded runs are deterministic run-to-run (the property the
    reference's CAS-loop float atomics could not give, SURVEY §5.2);
    cross-checking vs the single-device engine uses a tolerance because
    the tp psum legitimately reorders the f32 partition reduction."""
    mesh = make_mesh((2, 4))
    pts, nparts = 16, 8
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    batch = 2
    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=True)
    bx = RNG.standard_normal((batch, pts)).astype(np.float32)
    bh = RNG.standard_normal((batch, pts)).astype(np.float32)

    def run():
        st = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
        outs = []
        for _ in range(5):
            st, o = step(st, bx, bh)
            outs.append(np.asarray(o))
        return np.stack(outs)

    np.testing.assert_array_equal(run(), run())


class TestDistFFT:
    """Single-transform FFT sharded over the mesh (all_to_all transpose)."""

    @pytest.mark.parametrize("n", [1 << 10, 1 << 14])
    def test_matches_numpy(self, n):
        from opencl_fft_tpu.parallel.dist_fft import dist_fft
        mesh = make_mesh((1, 8))
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
             ).astype(np.complex64)
        got = np.asarray(dist_fft(x, mesh, axis="tp"))
        ref = np.fft.fft(x)
        np.testing.assert_allclose(got, ref, atol=3e-5 * np.max(np.abs(ref)),
                                   rtol=0)

    def test_inverse_and_batch(self):
        from opencl_fft_tpu.parallel.dist_fft import dist_fft
        mesh = make_mesh((1, 8))
        x = (RNG.standard_normal((3, 4096)) + 1j * RNG.standard_normal((3, 4096))
             ).astype(np.complex64)
        fwd = np.asarray(dist_fft(x, mesh, axis="tp"))
        back = np.asarray(dist_fft(fwd, mesh, axis="tp", sign=+1)) / 4096
        np.testing.assert_allclose(back, x, atol=2e-5 * np.max(np.abs(x)),
                                   rtol=0)

    def test_matches_single_device_fft(self):
        from opencl_fft_tpu.ops.fft import fft_unnormalized
        from opencl_fft_tpu.parallel.dist_fft import dist_fft
        mesh = make_mesh((1, 8))
        x = (RNG.standard_normal(8192) + 1j * RNG.standard_normal(8192)
             ).astype(np.complex64)
        got = np.asarray(dist_fft(x, mesh, axis="tp"))
        ref = np.asarray(fft_unnormalized(x, -1))
        np.testing.assert_allclose(got, ref, atol=2e-5 * np.max(np.abs(ref)),
                                   rtol=0)

    def test_rejects_unshardable(self):
        from opencl_fft_tpu.parallel.dist_fft import dist_fft
        mesh = make_mesh((1, 8))
        with pytest.raises(ValueError):
            dist_fft(np.zeros(8, np.complex64), mesh, axis="tp")


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_sharded_xfade_blends_and_preserves_untouched(shape):
    """Sharded IR hot-swap: swapped channels blend their two exact
    convolutions (scipy oracle); untouched channels match a never-swapped
    sharded engine to f32 ulp noise (the stacked-inverse fade step is a
    different XLA program, so reduction orders differ — the bitwise
    guarantee lives on the vmapped Convolver); after the fade the plain
    step carries on from xf's base keys."""
    from scipy import signal as sps

    mesh = make_mesh(shape)
    pts, nparts, batch, K, start = 32, 8, 8, 2, 3
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    irs0 = RNG.standard_normal((batch, cfg.cvs)).astype(np.float32)
    ir_new = RNG.standard_normal(cfg.cvs).astype(np.float32)
    swap_ch = 5
    nblocks = 10
    x = RNG.standard_normal((nblocks, batch, pts)).astype(np.float32)

    def fresh():
        st = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
        ird = jax.device_put(jnp.asarray(irs0),
                             NamedSharding(mesh, P_("dp", None)))
        return sharded.sharded_push_ir(cfg, mesh, st, ird)

    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=False)
    begin, step_xf = sharded.make_sharded_pconv_xfade(cfg, mesh)

    # swap target: (batch, cvs) with only swap_ch's row meaningful
    irs_new = np.zeros((batch, cfg.cvs), np.float32)
    irs_new[swap_ch] = ir_new
    mask = np.zeros(batch, bool)
    mask[swap_ch] = True
    irs_new_d = jax.device_put(jnp.asarray(irs_new),
                               NamedSharding(mesh, P_("dp", None)))
    mask_d = jax.device_put(jnp.asarray(mask),
                            NamedSharding(mesh, P_("dp")))

    st, ref_st = fresh(), fresh()
    outs, refs = [], []
    xf = None
    for i in range(nblocks):
        if i == start:
            xf = begin(st, irs_new_d, mask_d)
        if xf is not None and i - start < K:
            ramp = (np.arange(pts, dtype=np.float32) + 1
                    + (i - start) * pts) / np.float32(K * pts)
            xf, o = step_xf(xf, x[i], jnp.asarray(ramp))
            if i - start == K - 1:
                st = {k: xf[k] for k in st}     # adopt base keys
                xf = None
        else:
            st, o = step(st, x[i])
        ref_st, ro = step(ref_st, x[i])
        outs.append(np.asarray(o))
        refs.append(np.asarray(ro))
    got = np.stack(outs)            # (nblocks, batch, pts)
    unswapped = np.stack(refs)

    # untouched channels: equal to the never-swapped engine to ulp noise
    scale = np.max(np.abs(unswapped)) + 1e-9
    for ch in range(batch):
        if ch != swap_ch:
            np.testing.assert_allclose(got[:, ch], unswapped[:, ch],
                                       atol=1e-5 * scale, rtol=0)

    # swapped channel: blended then pure-new vs scipy
    xs = x[:, swap_ch].reshape(-1)
    y_old = sps.fftconvolve(xs, irs0[swap_ch])[: nblocks * pts]
    y_new = sps.fftconvolve(xs, ir_new)[: nblocks * pts]
    r = np.zeros(nblocks * pts, np.float32)
    f0, f1 = start * pts, (start + K) * pts
    r[f0:f1] = (np.arange(K * pts) + 1) / np.float32(K * pts)
    r[f1:] = 1.0
    expect = (1 - r) * y_old + r * y_new
    np.testing.assert_allclose(got[:, swap_ch].reshape(-1), expect,
                               atol=1e-4 * np.max(np.abs(expect)), rtol=0)


def test_sharded_step_collective_structure():
    """Pin the SCALING claim, not just narrate it (docs/SCALING.md): the
    sharded per-block step's only cross-chip communication is ONE psum
    of the O(bins) accumulator per plane — the lowered module contains
    exactly the all-reduces of `jax.lax.psum(acc_re/acc_im, "tp")`, each
    reducing O(batch/dp x bins) elements, never O(nparts x bins)."""
    import re

    mesh = make_mesh((2, 4))
    pts, nparts, batch = 32, 8, 8
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    state = _put_state(sharded.sharded_pconv_init(cfg, batch), mesh)
    step = sharded.make_sharded_pconv_step(cfg, mesh, tv=True)
    bx = jax.device_put(jnp.zeros((batch, pts), jnp.float32),
                        NamedSharding(mesh, P_("dp", None)))

    hlo = jax.jit(step).lower(state, bx, bx).as_text()
    reduces = re.findall(r'"stablehlo\.all_reduce"|stablehlo\.all_reduce',
                         hlo)
    # acc_re + acc_im: 2 logical psums (the compiler may merge them into
    # one all-reduce with two operands — count OPS, bound by 2)
    assert 1 <= len(reduces) <= 2, hlo[:2000]

    # every all-reduce operand is O(bins)-sized: (batch/dp, bins) f32 =
    # 4*bins floats per local shard — assert no reduce carries an
    # nparts-scaled operand (the naive unsharded-MAC shape)
    per_shard = (batch // 2) * cfg.bins
    for m in re.finditer(r"all_reduce.*?tensor<([0-9x]+)xf32>", hlo):
        dims = [int(d) for d in m.group(1).split("x")]
        n = int(np.prod(dims))
        assert n <= 2 * per_shard, (dims, per_shard)

    # and the wire claim is per BLOCK: executing one step moves no more
    # collective payload than those accumulators. Sanity-run it.
    out = jax.jit(step)(state, bx, bx)[1]
    assert out.shape == (batch, pts)
