import os

import numpy as np
import pytest

from octseg.explain.cam import CAM_METHODS, CAMProcessor
from tests.test_infer import make_model_dir


@pytest.fixture(scope='module')
def bundle(tmp_path_factory):
    from octseg.infer.engine import load_model_bundle

    root = str(tmp_path_factory.mktemp('cam_models'))
    model_dir = make_model_dir(root, 'LM', ['Lumen'], input_size=64)
    return load_model_bundle(model_dir)


@pytest.mark.parametrize('method', CAM_METHODS)
def test_cam_methods_produce_valid_maps(bundle, method, rng):
    model, variables, model_cfg = bundle
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    proc = CAMProcessor(model, variables, method=method)
    cam = proc.extract_activation_map(img, category=0, mask=mask)
    assert cam.shape == (64, 64)
    assert np.all(cam >= 0) and np.all(cam <= 1)
    assert np.isfinite(cam).all()


def test_overlay(bundle, rng):
    model, variables, _ = bundle
    proc = CAMProcessor(model, variables)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    cam = rng.random((64, 64)).astype(np.float32)
    out = proc.overlay_activation_map(img, cam)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_visualize_driver(tmp_path, rng):
    from octseg.core.config import Config
    from octseg.data.io import imwrite, imwrite_mask_tiff
    from octseg.explain.visualize_activation_maps import main

    root = str(tmp_path)
    model_dir = make_model_dir(root, 'LM', ['Lumen'], input_size=64)
    data_dir = tmp_path / 'data'
    (data_dir / 'img').mkdir(parents=True)
    (data_dir / 'mask').mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        mask = np.zeros((64, 64, 4), np.uint8)
        mask[10:30, 10:30, 0] = 255
        imwrite(str(data_dir / 'img' / f'{i}.png'), img)
        imwrite_mask_tiff(str(data_dir / 'mask' / f'{i}.tiff'), mask)
    save_dir = tmp_path / 'maps'
    main(Config(model_dir=model_dir, data_dir=str(data_dir), classes=None,
                save_dir=str(save_dir), cam_method='GradCAM', map_threshold=0.5,
                feature_level=5))
    out = save_dir / 'GradCAM'
    files = sorted(os.listdir(out))
    assert 'metrics.csv' in files
    assert '0_Lumen_overlay.png' in files and '0_Lumen_map.png' in files
    assert len([f for f in files if f.endswith('.png')]) == 2 * 5  # 5 PNGs per pair


@pytest.mark.parametrize('arch', [
    'FPN',
    # the tap contract is arch-independent; FPN covers the upsampled-head
    # case fast, the other two run in the CI full tier
    pytest.param('DeepLabV3Plus', marks=pytest.mark.heavy),
    pytest.param('MAnet', marks=pytest.mark.heavy),
])
def test_cam_on_upsampled_head_archs(tmp_path, rng, arch):
    """CAM must work for every zoo architecture, including decoders that
    emit sub-resolution maps with an upsampling head (FPN 1/4, DeepLabV3+
    1/4) and the attention decoder (MAnet) — the encode/decode tap contract
    is arch-independent."""
    from octseg.infer.engine import load_model_bundle

    model_dir = make_model_dir(str(tmp_path), f'CAM_{arch}', ['Lumen'],
                               arch=arch, input_size=64)
    model, variables, _cfg = load_model_bundle(model_dir)
    proc = CAMProcessor(model, variables, method='GradCAM')
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    cam = proc.extract_activation_map(img, category=0, mask=mask)
    assert cam.shape == (64, 64)
    assert np.isfinite(cam).all() and cam.min() >= 0 and cam.max() <= 1


def test_pspnet_cam_taps_a_consumed_level(tmp_path, rng):
    """PSPNet's decoder consumes only features[3] (encoder_depth=3
    semantics); tapping the default level 5 yields identically-zero
    gradients and blank CAMs. The auto level must produce a live map."""
    from octseg.infer.engine import load_model_bundle
    from tests.test_infer import make_model_dir

    model_dir = make_model_dir(str(tmp_path), 'PSP', ['Lumen'],
                               arch='PSPNet', encoder='resnet18',
                               input_size=64)
    from octseg.explain.cam import SemanticSegmentationTarget

    model, variables, _cfg = load_model_bundle(model_dir)
    proc = CAMProcessor(model, variables, method='GradCAM')
    assert proc.level == 3
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.float32)
    target = SemanticSegmentationTarget(0, np.ones((64, 64), np.float32))
    _a, g, _f = proc._acts_and_grads(img, target)
    assert np.abs(g).max() > 0, 'dead tap: zero gradients at the auto level'
    # counterfactual: level 5 IS dead for PSPNet (the old default)
    proc5 = CAMProcessor(model, variables, method='GradCAM', feature_level=5)
    _a5, g5, _f5 = proc5._acts_and_grads(img, target)
    assert np.abs(g5).max() == 0
