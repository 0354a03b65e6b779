import numpy as np
import pytest

from materialrefgs_tpu.config import OptimizationParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from materialrefgs_tpu.train.trainer import init_train_state


def test_checkpoint_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    cols = rng.uniform(size=(16, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=32)
    state = init_train_state(model, OptimizationParams(), envmap_res=16)

    save_checkpoint(state, 123, str(tmp_path))
    template = init_train_state(
        gm.create_from_points(pts * 0, cols, capacity=32),
        OptimizationParams(),
        envmap_res=16,
    )
    restored, it = load_checkpoint(template, str(tmp_path))
    assert it == 123
    np.testing.assert_allclose(
        np.asarray(restored.model.params.xyz),
        np.asarray(state.model.params.xyz),
        atol=1e-7,
    )
    # ASG re-zeroed on restore (reference quirk, gaussian_model.py:173)
    assert float(np.abs(np.asarray(restored.model.params.indirect_asg)).sum()) == 0.0
