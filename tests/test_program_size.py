"""Compiled-program payload regression guard.

The remote-TPU compile relay rejects oversized requests (HTTP 413), and
jax inlines closed-over / numpy-constant arrays as dense<...> literals in
the lowered module — an 8.4 MB pyramid pool matrix snuck into every step
program this way (fixed by the iota formulation, rso/frontend/pyramid.py).
Lowering for the TPU target is a host-side transformation, so the guard
runs on CPU CI.
"""
import jax
import jax.numpy as jnp
import pytest


# The relay rejected ~6 MB payloads; the default step lowers to 1.37 MB and
# the flow-mode step (more ops: LK levels + integer seed unfold) to 3.16 MB
# with no inlined-constant bloat — the limit leaves headroom below the
# rejection threshold while still catching multi-MB constants.
LIMIT_MB = 4.0


@pytest.mark.parametrize("flow", [False, True])
def test_step_program_mlir_stays_small(flow, monkeypatch):
    import dataclasses

    import jax.export

    from rso.config import IFMatchMethod
    from rso.engine import init_state, make_step
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import synthetic_config

    # the fused Pallas branches are gated on _on_tpu() at trace time; on CPU
    # CI they would be excluded and the guard would measure a smaller program
    # than the one a TPU host actually sends to the compile relay.  Mosaic
    # lowering itself is host-side, so forcing the gate true yields the real
    # TPU-module payload (custom-call kernels included).
    import rso.frontend.stereo_match as _sm
    import rso.frontend.track as _tr
    monkeypatch.setattr(_sm, "_on_tpu", lambda: True)
    monkeypatch.setattr(_tr, "_on_tpu", lambda: True)

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    cfg = synthetic_config()
    if flow:
        cfg = cfg.replace(if_match=dataclasses.replace(
            cfg.if_match, ifm_method=IFMatchMethod.OPTICAL_FLOW))
    step = make_step(cfg, cam, H, W)
    st0 = init_state(cfg, (H, W))
    st_spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                           st0)
    img_spec = jax.ShapeDtypeStruct((H, W), jnp.uint8)
    exp = jax.export.export(jax.jit(step), platforms=["tpu"])(
        st_spec, img_spec, img_spec)
    size_mb = len(exp.mlir_module()) / 1e6
    assert size_mb < LIMIT_MB, (
        f"step program is {size_mb:.2f} MB of MLIR (limit {LIMIT_MB}); a "
        f"large inlined constant probably crept in — express it with iotas "
        f"or pass it as an argument (see rso/frontend/pyramid.py)")
