import numpy as np
import pytest

from octseg.train.data import OCTDataset
from octseg.train.native_loader import NativeLoader, native_available
from tests.test_train import make_fold


@pytest.fixture(scope='module')
def fold(tmp_path_factory):
    return make_fold(str(tmp_path_factory.mktemp('nl_fold')), n_train=8, size=80)


@pytest.mark.skipif(not native_available(), reason='no native toolchain')
def test_native_loader_matches_python_loader(fold):
    ds = OCTDataset(f'{fold}/train', ['Lumen'], input_size=64)
    loader = NativeLoader(ds, batch_size=4, shuffle=False, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    # reassemble in order and compare against the python host path
    imgs = np.concatenate([b[0] for b in batches])
    masks = np.concatenate([b[1] for b in batches])
    for i in range(len(ds)):
        ref_img, ref_mask = ds.load(i)
        np.testing.assert_allclose(imgs[i], ref_img, atol=1.0)  # cv2 fixed-point
        np.testing.assert_array_equal(masks[i], ref_mask)


@pytest.mark.skipif(not native_available(), reason='no native toolchain')
def test_native_loader_shuffles_between_epochs(fold):
    ds = OCTDataset(f'{fold}/train', ['Lumen'], input_size=64)
    loader = NativeLoader(ds, batch_size=4, shuffle=True, seed=7)
    e1 = np.concatenate([b[0] for b in loader])
    e2 = np.concatenate([b[0] for b in loader])
    assert e1.shape == e2.shape == (8, 64, 64, 3)
    assert not np.array_equal(e1, e2)
    # same content overall, different order
    np.testing.assert_allclose(
        np.sort(e1.sum(axis=(1, 2, 3))), np.sort(e2.sum(axis=(1, 2, 3))), rtol=1e-6
    )


@pytest.mark.skipif(not native_available(), reason='no native toolchain')
def test_native_loader_surfaces_decode_errors(tmp_path):
    """A corrupt PNG must raise a clean IOError through the poisoned-batch
    protocol (dataloader.cc batch.count = -1), never crash the process."""
    root = make_fold(str(tmp_path / 'fold'), n_train=4, n_test=1, size=48)
    # truncate one image mid-stream
    victim = f'{root}/train/img/001.png'
    blob = open(victim, 'rb').read()
    with open(victim, 'wb') as f:
        f.write(blob[: len(blob) // 2])
    ds = OCTDataset(f'{root}/train', ['Lumen'], input_size=48)
    loader = NativeLoader(ds, batch_size=4, shuffle=False, seed=0)
    with pytest.raises(IOError):
        list(loader)
