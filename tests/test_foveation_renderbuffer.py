"""Foveation warp, motion vectors, render buffer, utils tests."""

import numpy as np

from instant_ngp_tpu.common import TonemapCurve
from instant_ngp_tpu.foveation import (Foveation, PiecewiseQuadratic,
                                       motion_vectors, to_ndc_depth)
from instant_ngp_tpu.render_buffer import RenderBuffer, tonemap_curve
from instant_ngp_tpu.utils import Ema, PhaseTimers


def test_piecewise_quadratic_roundtrip():
    # gentle foveation (the reference's defaults stay in this envelope;
    # aggressive steepness+radius pairs make the closed form non-monotone
    # by construction)
    pq = PiecewiseQuadratic.solve(1.3, 0.5, 0.1)
    x = np.linspace(0, 1, 101)
    y = pq.warp(x)
    assert (np.diff(y) >= -1e-6).all()          # monotone
    assert abs(y[0]) < 1e-6 and abs(y[-1] - 1) < 1e-5
    back = pq.unwarp(y)
    np.testing.assert_allclose(back, x, atol=1e-4)
    # center of the warp is 1:1 (density = steepness there)
    assert abs(pq.density(np.array(0.5)) - 1.3) < 1e-5


def test_foveation_identity_default():
    f = Foveation()
    uv = np.random.RandomState(0).rand(16, 2)
    np.testing.assert_allclose(f.warp(uv), uv)
    np.testing.assert_allclose(f.density(uv), 1.0)


def test_motion_vectors_static_camera_zero():
    cam = np.array([[1, 0, 0, 0.5], [0, -1, 0, 0.5], [0, 0, 1, -1.0]],
                   np.float32)
    px = np.array([[10, 12], [20, 5]], np.float32)
    mv = motion_vectors(px, np.array([2.0, 2.5]), (32, 32), (40.0, 40.0),
                        cam, cam)
    np.testing.assert_allclose(mv, 0.0, atol=1e-3)


def test_motion_vectors_translated_camera_nonzero():
    cam = np.array([[1, 0, 0, 0.5], [0, -1, 0, 0.5], [0, 0, 1, -1.0]],
                   np.float32)
    prev = cam.copy()
    prev[0, 3] += 0.1
    mv = motion_vectors(np.array([[16, 16]], np.float32),
                        np.array([2.0]), (32, 32), (40.0, 40.0), cam, prev)
    assert np.abs(mv).max() > 0.5


def test_ndc_depth_bounds():
    assert abs(to_ndc_depth(0.1, 0.1, 100.0) - 1.0) < 1e-9
    assert abs(to_ndc_depth(100.0, 0.1, 100.0)) < 1e-6
    mid = to_ndc_depth(1.0, 0.1, 100.0)
    assert 0.0 < mid < 1.0


def test_tonemap_curves():
    x = np.array([[0.0, 0.5, 4.0]])
    for curve in TonemapCurve:
        y = tonemap_curve(np.repeat(x[..., None], 3, -1), curve)
        assert np.isfinite(y).all()
        if curve != TonemapCurve.Identity:
            assert (y <= 1.2).all()


def test_render_buffer_accumulation():
    rb = RenderBuffer(4, 4)
    a = np.zeros((4, 4, 4), np.float32)
    b = np.ones((4, 4, 4), np.float32)
    rb.accumulate(a)
    rb.accumulate(b)
    np.testing.assert_allclose(rb.accumulation, 0.5)
    assert rb.spp == 2
    out = rb.framebuffer(srgb=False)
    np.testing.assert_allclose(out[..., :3], 0.5)


def test_ema_and_timers():
    e = Ema(half_life_s=1.0)
    e.update(1.0, now=0.0)
    v = e.update(0.0, now=1.0)   # one half-life: halfway
    assert abs(v - 0.5) < 1e-6
    t = PhaseTimers()
    with t.time("phase"):
        pass
    assert t.ms("phase") >= 0.0


def test_dynamic_resolution_controller():
    """Controller tracks the frame budget (testbed.cu:2884-2924): slow
    renders shrink resolution, fast renders grow it back to full, with
    the reference's [0.8, 1.2] hysteresis band and [1/16, 1] clamp."""
    from instant_ngp_tpu.render_buffer import DynamicResolution

    dr = DynamicResolution((1600, 900), target_fps=30.0)
    assert dr.resolution == (100, 56)  # 1/16 warmup

    # consistently fast renders -> grows to full resolution
    for _ in range(20):
        w, h = dr.update(render_ms=1.0)
    assert (w, h) == (1600, 900)

    # consistently slow renders -> shrinks, never below 1/16
    for _ in range(20):
        w, h = dr.update(render_ms=10000.0)
    assert (w, h) == (100, 56)
    assert w >= 1600 // 16 and h >= 900 // 16

    # hysteresis: small perturbation around steady state doesn't resize
    dr2 = DynamicResolution((1600, 900), target_fps=30.0)
    for _ in range(20):
        dr2.update(render_ms=120.0)
    steady = dr2.resolution
    r = dr2.update(render_ms=130.0)
    assert r == steady

    # disabled -> fixed factor
    dr3 = DynamicResolution((1600, 900), enabled=False, fixed_res_factor=16)
    assert dr3.update(render_ms=5.0) == (800, 450)
