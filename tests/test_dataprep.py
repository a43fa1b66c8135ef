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


def test_dicom_nested_undefined_sequence_before_pixeldata(tmp_path, rng):
    """Explicit-VR files with undefined-length sequences holding
    undefined-length items (the standard nested encoding for per-frame
    functional groups) must not desync the parser: the item CONTENT is a
    dataset whose elements carry VR bytes, not bare item headers."""
    import struct

    frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    path = str(tmp_path / 'IMG_SQ')
    dicom.dcmwrite(path, frames, tags={'PatientName': 'SQ^Test'})
    buf = bytearray(open(path, 'rb').read())

    # locate the end of the file meta group (explicit VR LE elements)
    pos = 132
    while pos + 8 <= len(buf):
        group, _elem = struct.unpack_from('<HH', buf, pos)
        if group != 0x0002:
            break
        vr = bytes(buf[pos + 4:pos + 6])
        if vr in (b'OB', b'OW', b'SQ', b'UN', b'UT'):
            (ln,) = struct.unpack_from('<I', buf, pos + 8)
            pos += 12 + ln
        else:
            (ln,) = struct.unpack_from('<H', buf, pos + 6)
            pos += 8 + ln

    # splice in: SQ(undefined) -> item(undefined) -> UI element -> delims
    sq = (struct.pack('<HH', 0x0008, 0x1115) + b'SQ\x00\x00'
          + struct.pack('<I', 0xFFFFFFFF))
    item = struct.pack('<HHI', 0xFFFE, 0xE000, 0xFFFFFFFF)
    ui = (struct.pack('<HH', 0x0008, 0x0018) + b'UI'
          + struct.pack('<H', 6) + b'1.2.3\x00')
    item_delim = struct.pack('<HHI', 0xFFFE, 0xE00D, 0)
    seq_delim = struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)
    buf[pos:pos] = sq + item + ui + item_delim + seq_delim
    spliced = str(tmp_path / 'IMG_SQ2')
    open(spliced, 'wb').write(bytes(buf))

    ds = dicom.dcmread(spliced)
    np.testing.assert_array_equal(ds.pixel_array, frames)
    assert ds.PatientName == 'SQ^Test'


def test_dicom_multi_fragment_single_frame(tmp_path):
    """A frame may span several pixel-data fragments (PS3.5 A.4): a
    single-frame JPEG split across two fragments must reassemble."""
    import struct

    import cv2

    img = np.full((16, 16, 3), 200, np.uint8)
    ok, jpeg = cv2.imencode('.jpg', img)
    assert ok
    jpeg = jpeg.tobytes()
    if len(jpeg) % 2:
        jpeg += b'\x00'
    half = (len(jpeg) // 2) & ~1  # fragments must be even-length

    def elem(group, el, vr, data):
        head = struct.pack('<HH', group, el)
        if vr in ('OB',):
            return head + vr.encode() + b'\x00\x00' + struct.pack('<I', len(data)) + data
        return head + vr.encode() + struct.pack('<H', len(data)) + data

    ts = b'1.2.840.10008.1.2.4.50\x00'  # JPEG baseline
    meta = elem(0x0002, 0x0010, 'UI', ts)
    body = b''
    body += elem(0x0028, 0x0010, 'US', struct.pack('<H', 16))  # Rows
    body += elem(0x0028, 0x0011, 'US', struct.pack('<H', 16))  # Columns
    body += elem(0x0028, 0x0002, 'US', struct.pack('<H', 3))   # SamplesPerPixel
    body += elem(0x0028, 0x0100, 'US', struct.pack('<H', 8))   # BitsAllocated
    # encapsulated PixelData: OB undefined length, empty BOT, 2 fragments
    px = (struct.pack('<HH', 0x7FE0, 0x0010) + b'OB\x00\x00'
          + struct.pack('<I', 0xFFFFFFFF)
          + struct.pack('<HHI', 0xFFFE, 0xE000, 0)             # empty BOT
          + struct.pack('<HHI', 0xFFFE, 0xE000, half) + jpeg[:half]
          + struct.pack('<HHI', 0xFFFE, 0xE000, len(jpeg) - half) + jpeg[half:]
          + struct.pack('<HHI', 0xFFFE, 0xE0DD, 0))
    path = str(tmp_path / 'IMG_FRAG')
    open(path, 'wb').write(b'\x00' * 128 + b'DICM' + meta + body + px)

    arr = dicom.dcmread(path).pixel_array
    assert arr.shape == (16, 16, 3)
    assert abs(int(arr.astype(int).mean()) - 200) < 8  # lossy JPEG tolerance


def test_fold_mask_channels_for_class_subsets(tmp_path, rng):
    """Masks are indexed by GLOBAL class id (channel = class_id - 1), so a
    class subset with high ids needs max-id channels. (The reference
    allocates len(classes) channels and crashes for such subsets,
    convert_int_to_cv.py:188-199.)"""
    from octseg.data.convert_int_to_cv import process_pair

    img_path = str(tmp_path / 'f.png')
    cv2.imwrite(img_path, rng.integers(0, 255, (64, 64, 3), np.uint8))
    obj = np.zeros((64, 64), bool)
    obj[20:40, 20:40] = True
    df = pd.DataFrame([{
        'img_path': img_path, 'class_name': 'Vasa vasorum',
        'encoded_mask': convert_numpy_to_base64(obj),
    }])
    for d in ('img', 'mask', 'mask_color'):
        os.makedirs(tmp_path / 'out' / d, exist_ok=True)
    process_pair(df, str(tmp_path / 'out'), None,
                 classes=['Fibrous cap', 'Vasa vasorum'], smooth_mask=False)
    mask = read_tiff(str(tmp_path / 'out' / 'mask' / 'f.tiff'))
    assert mask.shape[2] == 4  # up to the Vasa vasorum channel (id 4)
    assert (mask[:, :, 3] == 255).sum() == obj.sum()
    assert (mask[:, :, :3] == 0).all()


def test_acquisition_time_without_fraction(tmp_path, rng):
    """DICOM TM values without fractional seconds are valid; the reference's
    '%H%M%S.%f'-only parse flags such files as broken."""
    from octseg.data.extract_metadata import extract_metadata

    frames = rng.integers(0, 256, (1, 8, 8, 3), dtype=np.uint8)
    path = str(tmp_path / 'IMG001')
    dicom.dcmwrite(path, frames, tags={'AcquisitionTime': '142530'})
    meta = extract_metadata(path)
    assert meta['Acquisition Time'] == '14:25:30'


def test_data_processing_non_square_output(tmp_path, rng):
    """output_size is [height, width]; PIL resize takes (width, height) —
    images and masks must agree for non-square sizes."""
    from octseg.data.utils import data_processing

    cv2.imwrite(str(tmp_path / 'a.png'),
                rng.integers(0, 255, (64, 48, 3), np.uint8))
    images, masks, names = data_processing(
        str(tmp_path), str(tmp_path / 'out'), [100, 80])
    assert images[0].size == (80, 100)  # PIL (width, height)
    assert masks[0].shape == (100, 80, 4)
