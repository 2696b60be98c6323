"""Roofline cost models: floors must be sane, positive, and composable."""

import numpy as np

from sift_parallel_optimization_tpu.bench.roofline import (
    TPU_V5E,
    CostModel,
    dense_score_model,
    descriptor_model,
    frontend_model,
    matching_model,
    reference_pyramid_model,
    refit_model,
    sift_pyramid_model,
    stage_models,
)
from sift_parallel_optimization_tpu.models.frontend import sift_config


def test_floor_is_max_of_resources():
    m = CostModel(hbm_bytes=819e9 * 1e-3)  # exactly 1 ms of HBM traffic
    assert abs(m.floor_ms(TPU_V5E) - 1.0) < 1e-9
    assert m.bound() == "hbm"
    m2 = CostModel(hbm_bytes=819e6, mxu_bf16_flops=197e12 * 1e-2)
    assert abs(m2.floor_ms(TPU_V5E) - 10.0) < 1e-6  # compute dominates
    assert m2.bound() == "mxu"


def test_sol_pct_inverse_in_measurement():
    m = reference_pyramid_model(512, 2)
    f = m.floor_ms()
    assert m.sol_pct(f) == 100.0
    assert m.sol_pct(2 * f) == 50.0


def test_models_positive_and_monotone_in_size():
    cfg256, cfg512 = sift_config(256), sift_config(512)
    for build in (sift_pyramid_model, dense_score_model):
        small, big = build(cfg256), build(cfg512)
        assert 0 < small.floor_ms() < big.floor_ms()
    assert 0 < refit_model(256).floor_ms() < refit_model(512).floor_ms()
    assert (
        0
        < descriptor_model(cfg512, 256).floor_ms()
        < descriptor_model(cfg512, 512).floor_ms()
    )
    assert 0 < matching_model(512).floor_ms()


def test_frontend_floor_is_stage_sum():
    cfg = sift_config(512)
    stages = stage_models(cfg, 512)
    total = frontend_model(cfg, 512)
    parts = sum(
        stages[s].floor_ms()
        for s in ("pyramid", "dense_score", "refit", "descriptors")
    )
    # Floors are max() per stage, so the total floor is <= the sum of
    # stage floors but must be within the same order.
    assert total.floor_ms() <= parts + 1e-9
    assert total.floor_ms() > 0.5 * parts


def test_known_magnitudes():
    """Anchor the models against the round-3 measured numbers so a unit
    slip (bytes vs bits, ms vs us) cannot pass silently."""
    # REFERENCE pyramid 512^2 S=2: ~8.4 MB -> ~0.010 ms floor (measured
    # 0.022 ms on chip, ~45% SOL).
    f = reference_pyramid_model(512, 2).floor_ms()
    assert 0.005 < f < 0.02, f
    # Frontend 512^2 K=512 floor must sit below the measured 0.51 ms.
    cfg = sift_config(512)
    f2 = frontend_model(cfg, 512).floor_ms()
    assert 0.05 < f2 < 0.51, f2
    # Descriptor stage: patch DMA dominates, ~67 MB one-way -> ~0.1 ms
    # (measured stage: 0.166 ms).
    f3 = descriptor_model(cfg, 512).floor_ms()
    assert 0.06 < f3 < 0.166, f3
    d = descriptor_model(cfg, 512)
    assert d.bound() == "hbm"
    assert np.isfinite(f3)
