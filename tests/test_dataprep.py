"""End-to-end data-prep chain test: synthetic DICOMs → frames → Supervisely
project → interim metadata → 5-fold CV dataset."""

import base64
import json
import os
import zlib

import cv2
import numpy as np
import pandas as pd
import pytest

from octseg.core.config import Config
from octseg.data import dicom
from octseg.data.tiffio import read_tiff
from octseg.data.utils import convert_base64_to_numpy, convert_numpy_to_base64

SIZE = 120  # frame size for the synthetic pipeline
N_STUDIES = 6
N_FRAMES = 4


def test_dicom_roundtrip(tmp_path, rng):
    frames = rng.integers(0, 256, (3, 40, 60, 3), dtype=np.uint8)
    path = str(tmp_path / 'IMG001')
    dicom.dcmwrite(path, frames, tags={
        'PatientName': 'A^B', 'AcquisitionDate': '20230304',
        'AcquisitionTime': '091500.000000', 'WindowCenter': '127',
    })
    ds = dicom.dcmread(path)
    np.testing.assert_array_equal(ds.pixel_array, frames)
    assert int(ds.Rows) == 40 and int(ds.NumberOfFrames) == 3
    assert ds.PatientName == 'A^B'


def test_base64_mask_roundtrip(rng):
    mask = rng.random((30, 40)) > 0.6
    enc = convert_numpy_to_base64(mask)
    back = convert_base64_to_numpy(enc)
    np.testing.assert_array_equal(back, mask)


@pytest.fixture(scope='module')
def pipeline_dirs(tmp_path_factory):
    """Build synthetic studies and run the full prep chain."""
    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp('prep')
    dcm_dir = root / 'dcm'

    # 1. synthetic DICOM studies, one series each
    for s in range(1, N_STUDIES + 1):
        frames = rng.integers(20, 200, (N_FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
        dicom.dcmwrite(str(dcm_dir / f'{s:03d}' / 'IMG001'), frames)

    # 2. extract metadata
    from octseg.data.extract_metadata import main as extract_main
    extract_main(Config(data_dir=str(dcm_dir), save_dir=str(root)))

    # 3. convert dicoms to frames
    from octseg.data.convert_dicoms import main as dicoms_main
    dicoms_main(Config(
        data_dir=str(dcm_dir), save_dir=str(root / 'sly_input'),
        output_size=[SIZE, SIZE], to_gray=False, output_type='image', fps=5,
        include_dirs=[], exclude_dirs=[],
    ))

    # 4. synthetic Supervisely project over those frames (polygon + bitmap)
    sly_dir = root / 'sly_output'
    classes = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']
    for s in range(1, N_STUDIES + 1):
        study = f'{s:03d}'
        ds_dir = sly_dir / study
        (ds_dir / 'ann').mkdir(parents=True)
        (ds_dir / 'frames' / f'{study}_1.mp4').mkdir(parents=True)
        # frames dir fallback: copy converted pngs
        src_frames = sorted((root / 'sly_input' / study / '1').glob('*.png'))
        for i, p in enumerate(src_frames, 1):
            img = cv2.imread(str(p))
            cv2.imwrite(str(ds_dir / 'frames' / f'{study}_1.mp4' / f'{i:03d}.png'), img)
        figures_frames = []
        objects = []
        for fi in range(N_FRAMES):
            cls = classes[(s + fi) % len(classes)]
            key = f'obj_{s}_{fi}'
            objects.append({'key': key, 'classTitle': cls})
            cy, cx = 40 + 5 * fi, 50 + 3 * s
            if fi % 2 == 0:  # polygon
                poly = [[cx - 15, cy - 10], [cx + 15, cy - 12], [cx + 18, cy + 10],
                        [cx - 12, cy + 14]]
                fig = {'objectKey': key, 'geometryType': 'polygon',
                       'geometry': {'points': {'exterior': poly, 'interior': []}}}
            else:  # bitmap
                m = np.zeros((24, 30), bool)
                m[4:20, 5:25] = True
                fig = {'objectKey': key, 'geometryType': 'bitmap',
                       'geometry': {'bitmap': {
                           'origin': [cx - 15, cy - 12],
                           'data': convert_numpy_to_base64(m)}}}
            figures_frames.append({'index': fi, 'figures': [fig]})
        ann = {'framesCount': N_FRAMES,
               'size': {'height': SIZE, 'width': SIZE},
               'objects': objects, 'frames': figures_frames}
        with open(ds_dir / 'ann' / f'{study}_1.mp4.json', 'w') as f:
            json.dump(ann, f)

    # 5. sly → interim
    from octseg.data.convert_sly_to_int import main as sly_main
    interim = root / 'interim'
    sly_main(Config(
        data_dir=str(sly_dir), save_dir=str(interim),
        crop=[[0, 0], [SIZE, SIZE]],
    ))

    # 6. interim → cv folds
    from octseg.data.convert_int_to_cv import main as cv_main
    cv_dir = root / 'cv'
    cv_main(Config(
        data_dir=str(interim), save_dir=str(cv_dir), save_color_mask=True,
        smooth_mask=False, num_folds=3, seed=11, split_column='study',
        crop=[[10, 0], [110, 100]], classes=classes,
    ))
    return {'root': root, 'interim': interim, 'cv': cv_dir, 'sly': sly_dir}


def test_extract_metadata_csv(pipeline_dirs):
    df = pd.read_csv(pipeline_dirs['root'] / 'dcm_metadata.csv')
    assert len(df) == N_STUDIES
    assert df['Slices'].iloc[0] == N_FRAMES
    assert list(df.columns)[:5] == [
        'Path', 'Study UID', 'Series UID', 'Study name', 'Series name',
    ]


def test_interim_metadata(pipeline_dirs):
    df = pd.read_csv(pipeline_dirs['interim'] / 'metadata.csv')
    assert len(df) == N_STUDIES * N_FRAMES
    with_objects = df.dropna(subset=['class_name'])
    assert len(with_objects) == N_STUDIES * N_FRAMES  # every frame has one object
    row = with_objects.iloc[0]
    assert row.box_width > 0 and row.area > 0
    mask = convert_base64_to_numpy(row.encoded_mask)
    assert mask.shape == (SIZE, SIZE)
    # interim frame images were ripped
    imgs = list((pipeline_dirs['interim'] / 'img').glob('*.png'))
    assert len(imgs) == N_STUDIES * N_FRAMES


def test_cv_folds_structure(pipeline_dirs):
    cv_dir = pipeline_dirs['cv']
    df = pd.read_csv(cv_dir / 'metadata.csv')
    assert set(df['fold']) == {1, 2, 3}
    # study-level split: no study appears in both train and test of a fold
    for fold in (1, 2, 3):
        part = df[df['fold'] == fold]
        train_studies = set(part[part['split'] == 'train']['study'])
        test_studies = set(part[part['split'] == 'test']['study'])
        assert not (train_studies & test_studies)
        assert train_studies and test_studies
    # artifacts exist with the crop size and {0,255} channel masks
    masks = sorted((cv_dir / 'fold_1' / 'train' / 'mask').glob('*.tiff'))
    assert masks
    m = read_tiff(str(masks[0]))
    assert m.shape == (100, 100, 4)
    assert set(np.unique(m)) <= {0, 255}
    img = cv2.imread(str(cv_dir / 'fold_1' / 'train' / 'img' / (masks[0].stem + '.png')))
    assert img.shape == (100, 100, 3)
    color = read_tiff(str(cv_dir / 'fold_1' / 'train' / 'mask_color' / masks[0].name))
    assert color.shape == (100, 100, 3)


def test_cv_fold_split_is_deterministic(pipeline_dirs):
    from octseg.data.convert_int_to_cv import cross_validation_split

    df = pd.read_csv(pipeline_dirs['interim'] / 'metadata.csv')
    df = df.dropna(subset=['class_name'])
    s1 = cross_validation_split(df, 'study', 3, seed=11)
    s2 = cross_validation_split(df, 'study', 3, seed=11)
    for (a_tr, a_te), (b_tr, b_te) in zip(s1, s2):
        assert set(a_te['study']) == set(b_te['study'])
