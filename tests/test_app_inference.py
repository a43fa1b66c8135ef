"""Real inference mode of the analysis engine (the reference's TODO stub,
src/app/tools/analysis.py:138,166 — implemented in octseg)."""

import numpy as np
import pytest

from octseg.analyze.analysis import get_analysis
from octseg.data import dicom
from tests.test_infer import make_model_dir


@pytest.mark.slow
def test_get_analysis_inference_mode(tmp_path, rng):
    # tiny 4-frame pullback + 3 random-weight models
    frames = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    dcm_path = str(tmp_path / 'IMG001')
    dicom.dcmwrite(dcm_path, frames)
    models_root = str(tmp_path / 'models')
    make_model_dir(models_root, 'LM', ['Lumen'], input_size=64)
    make_model_dir(models_root, 'FC_LC', ['Lipid core', 'Fibrous cap'], input_size=64)
    make_model_dir(models_root, 'VV', ['Vasa vasorum'], input_size=64)

    data = get_analysis(
        dcm_path, 'inference', models_dir=models_root,
        temp_root=str(tmp_path / 'temp'),
    )
    assert len(data['images']) == 4
    assert data['ratio'] == int(64 * 150 // 1000)
    import os

    work = data['work_dir']
    assert len(os.listdir(os.path.join(work, 'img'))) == 4
    assert len(os.listdir(os.path.join(work, 'mask'))) == 4
