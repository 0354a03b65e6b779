"""scale_schedule: uniform curriculum compression (chip-budget runs).

The compressed curriculum must preserve the reference's stage STRUCTURE
(run_refnerf.sh:31-44): every stage boundary, loss gate, and cadence scales
together so stage ordering and relative durations are unchanged.
"""

from materialrefgs_tpu import config as cfg


def test_identity():
    _, _, opt = cfg.preset_refnerf()
    assert cfg.scale_schedule(opt, 1.0) is opt


def test_half_scale_preserves_structure():
    _, _, opt = cfg.preset_refnerf()
    s = cfg.scale_schedule(opt, 0.5)
    assert s.iterations == 25000
    assert s.indirect_from_iter == 10000
    assert s.init_until_iter == 1500
    assert s.densify_until_iter == 15000
    assert s.normal_prop_until_iter == 15000
    assert s.opacity_reset_interval == 1500
    assert s.densification_interval == 50
    assert s.position_lr_max_steps == 15000
    assert s.sh_ladder_interval == 500
    # Stage ordering invariants survive scaling.
    assert s.init_until_iter < s.indirect_from_iter < s.iterations
    assert s.densify_from_iter < s.densify_until_iter
    # Ladders scale their thresholds, not their values.
    assert s.normal_gamma_ladder == tuple(
        (thr // 2, v) for thr, v in opt.normal_gamma_ladder
    )
    # Non-schedule hyperparameters untouched.
    assert s.position_lr_init == opt.position_lr_init
    assert s.lambda_dssim == opt.lambda_dssim


def test_small_scale_keeps_cadences_positive():
    _, _, opt = cfg.preset_refnerf()
    s = cfg.scale_schedule(opt, 0.001)
    assert s.densification_interval >= 1
    assert s.sh_ladder_interval >= 1
    assert s.opacity_reset_interval >= 1
    # Zero-valued boundaries (e.g. volume_render_until_iter=0 in the
    # refnerf preset) stay zero — "stage disabled" must not become 1.
    assert s.volume_render_until_iter == 0
