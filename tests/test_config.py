"""Preset numerical contracts vs the reference's HARDCODED trainer literals
(the ones not represented in arguments/__init__.py — easy to lose)."""
import pytest

from materialrefgs_tpu import config as cfg


@pytest.mark.core
def test_warp_start_gates_match_reference_literals():
    # train_refnerf.py:1253 / train_glossy.py:1317 gate the whole warp loss
    # at `iteration > 25000`; train_refreal.py:1211 at `> 7000`. The config
    # field of this name is dead upstream (defaults to 10000, never read);
    # here it IS the gate, so the presets must carry the literals.
    _, _, o = cfg.preset_refnerf()
    assert o.multi_view_weight_from_iter == 25000
    _, _, o = cfg.preset_glossy()
    assert o.multi_view_weight_from_iter == 25000
    _, _, o = cfg.preset_refreal()
    assert o.multi_view_weight_from_iter == 7000


@pytest.mark.core
def test_scale_schedule_scales_warp_gate():
    _, _, o = cfg.preset_refnerf()
    o2 = cfg.scale_schedule(o, 0.25)
    assert o2.multi_view_weight_from_iter == 6250
    assert o2.indirect_from_iter == 5000
    assert o2.iterations == 12500


@pytest.mark.core
def test_warp_term_application_matches_reference_trainers():
    # refnerf/glossy discard geo+NCC (train_refnerf.py:745 / glossy :772
    # return None for them); refreal applies both (refreal :729, :1216-1221).
    _, _, o = cfg.preset_refnerf()
    assert not o.use_warp_geo_loss and not o.use_warp_ncc_loss
    _, _, o = cfg.preset_glossy()
    assert not o.use_warp_geo_loss and not o.use_warp_ncc_loss
    _, _, o = cfg.preset_refreal()
    assert o.use_warp_geo_loss and o.use_warp_ncc_loss
    # Base-color warp literal (train_refnerf.py:534) is schedule-scaled.
    _, _, o = cfg.preset_refnerf()
    assert cfg.scale_schedule(o, 0.25).basecolor_warp_from_iter == 2500
