import numpy as np
import pytest
from PIL import Image

from octseg.data import tiffio


@pytest.mark.parametrize('channels', [1, 2, 4])
@pytest.mark.parametrize('compression', ['lzw', 'zip', 'none'])
def test_roundtrip(tmp_path, rng, channels, compression):
    arr = (rng.random((37, 53, channels)) > 0.5).astype(np.uint8) * 255
    arr = arr.squeeze() if channels == 1 else arr
    path = str(tmp_path / 'm.tiff')
    tiffio.write_tiff(path, arr, compression=compression)
    back = tiffio.read_tiff(path)
    expected = arr if arr.ndim == 3 else arr
    np.testing.assert_array_equal(back.squeeze(), expected.squeeze())


def test_pil_can_read_our_4ch(tmp_path, rng):
    arr = (rng.random((16, 16, 4)) > 0.5).astype(np.uint8) * 255
    path = str(tmp_path / 'm.tiff')
    tiffio.write_tiff(path, arr, compression='lzw')
    pil = np.array(Image.open(path))
    np.testing.assert_array_equal(pil, arr)


def test_read_reference_mask(reference_dir):
    path = f'{reference_dir}/data/visualization/mask/001_001.tiff'
    ours = tiffio.read_tiff(path)
    pil = np.array(Image.open(path))
    assert ours.shape == (750, 750, 4)
    np.testing.assert_array_equal(ours, pil)
    assert set(np.unique(ours)) <= {0, 255}


def test_read_reference_app_demo_mask(reference_dir):
    path = f'{reference_dir}/data/app/demo/mask/001_1_001.tiff'
    ours = tiffio.read_tiff(path)
    pil = np.array(Image.open(path))
    np.testing.assert_array_equal(ours, pil)
