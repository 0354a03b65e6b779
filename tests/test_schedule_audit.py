"""Schedule-literal audit (round-4 weak #7 / item 2).

Two training collapses in two rounds traced to absolute-iteration literals
surviving schedule compression (the warp gate's 25000, train_refnerf.py:1253;
the env reset's 6000, env_gaussian_model3.py:482-486). This suite pins the
contract that stops the bleeding:

1. Source audit: no hardcoded iteration thresholds outside config.py — every
   cadence/gate must read an OptimizationParams field so scale_schedule can
   move it.
2. Stage-position audit: for every preset x scale in {1, 0.25, 0.1}, each
   cadence fires at least once INSIDE its stage and its gates stay ordered
   the same way the reference's uncompressed curriculum orders them.
"""
import re

import pytest

from materialrefgs_tpu import config as cfg

PRESETS = {
    "refnerf": cfg.preset_refnerf,
    "refreal": cfg.preset_refreal,
    "glossy": cfg.preset_glossy,
}
SCALES = [1.0, 0.25, 0.1]


def scaled(preset, scale):
    _, _, opt = PRESETS[preset]()
    return cfg.scale_schedule(opt, scale)


def fires(interval, lo, hi):
    """Number of multiples of `interval` in (lo, hi)."""
    if interval <= 0:
        return 0
    return max(hi - 1, lo) // interval - lo // interval


# ----------------------------------------------------------- source audit --


def test_no_iteration_literals_outside_config():
    """Any `iteration <op> <literal>=1000` comparison outside config.py is a
    latent scale_schedule bypass (the exact failure class of the round-3 warp
    collapse and the round-4 env-cloud death)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "materialrefgs_tpu"
    pat = re.compile(
        r"\b(?:iteration|iter|it)\s*(?:>=?|<=?|==|%)\s*([0-9][0-9_]{2,})"
    )
    offenders = []
    for p in root.rglob("*.py"):
        if p.name == "config.py":
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            code = line.split("#")[0]
            m = pat.search(code)
            if m and int(m.group(1).replace("_", "")) >= 1000:
                offenders.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
    assert not offenders, (
        "hardcoded iteration thresholds bypass scale_schedule:\n"
        + "\n".join(offenders)
    )


# ----------------------------------------------------- stage-position audit --


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_stage_ordering(preset, scale):
    o = scaled(preset, scale)
    # Stage chain (run_refnerf.sh:31-44): init -> surfel -> surfel2 -> end.
    assert 0 < o.init_until_iter < o.indirect_from_iter < o.iterations
    # Densification spans the surfel stage and ends before the run does
    # (reference 30000 < 50000: the consolidation tail exists at any scale).
    assert o.densify_from_iter < o.densify_until_iter < o.iterations
    assert o.normal_prop_until_iter <= o.densify_until_iter


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_warp_gate_inside_run(preset, scale):
    """The warp literal (25000 refnerf/glossy, 7000 refreal) must fall
    strictly inside the run so the warp loss actually trains, and for
    refnerf/glossy after indirect onset (the round-3 collapse was warp
    firing BEFORE the surfel2 stage stabilized)."""
    o = scaled(preset, scale)
    assert 0 < o.multi_view_weight_from_iter < o.iterations
    if preset in ("refnerf", "glossy"):
        assert o.multi_view_weight_from_iter >= o.indirect_from_iter


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_env_cadences_fire_inside_indirect_stage(preset, scale):
    """Env-GS maintenance (birth at indirect_from, update until
    env_update_until): densify fires many times, the opacity reset at least
    once but NOT in the final grace-less stretch, and the post-reset regrowth
    window (ABSOLUTE env_prune_grace steps) fits before updates stop."""
    o = scaled(preset, scale)
    lo, hi = o.indirect_from_iter, o.env_update_until_iter
    assert lo < hi <= o.iterations
    assert fires(o.env_densify_interval, lo, hi) >= 8
    n_resets = fires(o.env_reset_interval, lo, hi)
    assert n_resets >= 1, "env reset never fires inside the update window"
    # Structure preservation: same number of resets as the uncompressed
    # curriculum (the round-4 failure was an EXTRA effective reset position).
    o1 = scaled(preset, 1.0)
    assert n_resets == fires(
        o1.env_reset_interval, o1.indirect_from_iter, o1.env_update_until_iter
    )
    # The absolute grace window must not be scaled (regrowth is optimizer
    # dynamics, not curriculum) ...
    assert o.env_prune_grace == o1.env_prune_grace == 500
    # ... and the last reset still leaves a full regrowth window plus at
    # least one real prune before updates freeze.
    last_reset = (hi - 1) // o.env_reset_interval * o.env_reset_interval
    if last_reset > lo:
        assert last_reset + o.env_prune_grace <= hi


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_main_model_cadences(preset, scale):
    o = scaled(preset, scale)
    # Densify fires throughout its window at every interval the trainer
    # uses (densification_interval outside normal-prop, _when_prop inside).
    assert fires(o.densification_interval, o.densify_from_iter, o.densify_until_iter) >= 10
    assert fires(
        o.densification_interval_when_prop,
        o.init_until_iter,
        o.normal_prop_until_iter,
    ) >= 4
    # Opacity reset cadence: >= 1 inside the densify window, count preserved.
    n = fires(o.opacity_reset_interval, o.densify_from_iter, o.densify_until_iter)
    o1 = scaled(preset, 1.0)
    assert n == fires(
        o1.opacity_reset_interval, o1.densify_from_iter, o1.densify_until_iter
    ) >= 1
    # Normal-prop resets fire inside the prop window.
    assert fires(o.normal_prop_interval, o.init_until_iter, o.normal_prop_until_iter) >= 1
    # opac_lr0 toggle fires inside the prop window.
    assert fires(o.opac_lr0_interval, o.init_until_iter, o.normal_prop_until_iter) >= 1


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_sh_ladder_saturates_before_indirect(preset, scale):
    """SH degree must reach max (3 oneups past feature_rest_from) before the
    traced stage starts, as in the uncompressed curriculum (5000 + 3x1000
    < 20000)."""
    o = scaled(preset, scale)
    assert (
        o.feature_rest_from_iter + 3 * o.sh_ladder_interval
        <= o.indirect_from_iter
    )


@pytest.mark.parametrize("preset", PRESETS)
@pytest.mark.parametrize("scale", SCALES)
def test_loss_gates_inside_run(preset, scale):
    o = scaled(preset, scale)
    assert o.normal_loss_start < o.iterations
    assert o.dist_loss_start < o.indirect_from_iter
    assert o.basecolor_warp_from_iter < o.iterations
    if o.use_perceptual_loss:
        assert o.perceptual_loss_start_iter < o.iterations
    # ref-score supervision: active inside the run for refreal, parked AT
    # iterations (disabled, reference behavior) for refnerf.
    if preset == "refreal":
        assert o.ref_score_start_iter < o.iterations
    else:
        assert o.ref_score_start_iter >= o.iterations


@pytest.mark.parametrize("scale", SCALES)
def test_mesh_cadence_scales(scale):
    """scripts/train.py derives mesh_every = 2000 x scale (the reference's
    `% 2000` literal, train_refnerf.py:1459); it must fire several times
    inside the surfel2 stage."""
    o = scaled("refnerf", scale)
    mesh_every = max(1, round(2000 * scale))
    assert fires(mesh_every, o.indirect_from_iter, o.iterations) >= 3
