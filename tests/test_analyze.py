import json
import os
import shutil
import urllib.error
import urllib.request

import cv2
import numpy as np
import pandas as pd
import pytest

from octseg.analyze.analysis import (
    calculate_object_thickness,
    calculate_thickness_contour,
    get_analysis,
)


@pytest.fixture(scope='module')
def demo_dir(tmp_path_factory, reference_dir):
    """Small demo workdir: 8 frames from the reference app demo pullback."""
    src = f'{reference_dir}/data/app/demo'
    dst = tmp_path_factory.mktemp('demo')
    (dst / 'img').mkdir()
    (dst / 'mask').mkdir()
    names = sorted(os.listdir(f'{src}/mask'))[40:48]  # frames with objects
    for n in names:
        stem = n.rsplit('.', 1)[0]
        shutil.copy(f'{src}/mask/{n}', dst / 'mask' / n)
        shutil.copy(f'{src}/img/{stem}.png', dst / 'img' / f'{stem}.png')
    return str(dst)


def test_thickness_contour_circle():
    mask = np.zeros((200, 200), np.uint8)
    cv2.circle(mask, (100, 100), 40, 255, -1)
    t = calculate_thickness_contour(mask)
    assert abs(t['median'] - 40) < 2
    assert abs(t['min'] - 40) < 2


def test_thickness_raymarch_annulus():
    mask = np.zeros((200, 200), np.uint8)
    cv2.circle(mask, (100, 100), 60, 255, -1)
    cv2.circle(mask, (100, 100), 30, 0, -1)
    t = calculate_object_thickness(mask)
    # outermost object radius along each ray ~ 60
    assert abs(t['median'] - 60) < 3


def test_get_analysis_demo(demo_dir):
    data = get_analysis(None, 'demo', demo_dir=demo_dir)
    # no DICOM available: ratio falls back to mask height (750) * 150 // 1000
    assert data['ratio'] == int(750 * 150 // 1000)
    assert len(data['images']) == 8
    found = [c for c, o in data['objects'].items() if o['slice']]
    assert found, 'expected at least one class present in demo frames'
    for class_name in found:
        obj = data['objects'][class_name]
        assert len(obj['area']) == len(obj['slice']) == len(obj['object_id'])
        assert all(a >= 0 for a in obj['area'])
        assert all(m for m in obj['masks'])
        # instance ids only ever step by 0 or +1
        diffs = np.diff(obj['object_id'])
        assert set(diffs) <= {0, 1}
    # JSON-able
    json.dumps(data)


def test_figures_render(demo_dir):
    from octseg.analyze import figures

    data = get_analysis(None, 'demo', demo_dir=demo_dir)
    for png in (
        figures.get_object_map(data),
        figures.get_trace_area(list(data['objects']), data),
        figures.get_plot_area(list(data['objects']), data),
        figures.get_img_show(data, img_dir=f'{demo_dir}/img', img_num=0),
    ):
        assert png[:8] == b'\x89PNG\r\n\x1a\n'


def test_app_server(demo_dir):
    from octseg.analyze.app import serve
    from octseg.core.config import Config

    server = serve(
        Config(host='127.0.0.1', port=0, demo_dir=demo_dir), block=False
    )
    host, port = server.server_address
    try:
        base = f'http://{host}:{port}'
        html = urllib.request.urlopen(f'{base}/').read().decode()
        assert 'KCC OCT analysis' in html
        req = urllib.request.Request(f'{base}/analyze?mode=demo', method='POST')
        info = json.loads(urllib.request.urlopen(req).read())
        assert info['n_frames'] == 8
        sid = info['sid']
        png = urllib.request.urlopen(f'{base}/object_map.png?sid={sid}').read()
        assert png[:4] == b'\x89PNG'
        frame = urllib.request.urlopen(
            f'{base}/frame.png?num=0&opacity=30&classes=Lumen&sid={sid}'
        ).read()
        assert frame[:4] == b'\x89PNG'
        meta = json.loads(
            urllib.request.urlopen(f'{base}/metadata.json?sid={sid}').read()
        )
        assert 'objects' in meta and 'ratio' in meta
        # interactive-viewer endpoints: raw frame + contour JSON with the
        # reference hover fields (img_viewer.py parity)
        base_png = urllib.request.urlopen(
            f'{base}/base_frame.png?sid={sid}&num=0'
        ).read()
        assert base_png[:4] == b'\x89PNG'
        found_any = False
        for num in range(info['n_frames']):
            payload = json.loads(urllib.request.urlopen(
                f'{base}/contours.json?sid={sid}&num={num}'
            ).read())
            assert payload['width'] > 0 and payload['height'] > 0
            for obj in payload['objects']:
                found_any = True
                assert set(obj) >= {'class', 'color', 'area', 'thickness_mean',
                                    'thickness_min', 'polygons'}
                assert len(obj['color']) == 3
                for poly in obj['polygons']:
                    assert len(poly) >= 3
                    xs = [p[0] for p in poly]
                    ys = [p[1] for p in poly]
                    assert 0 <= min(xs) and max(xs) < payload['width']
                    assert 0 <= min(ys) and max(ys) < payload['height']
        assert found_any, 'no contours in any demo frame'
        # omitting sid falls back to the latest session
        latest = json.loads(urllib.request.urlopen(
            f'{base}/contours.json?num=0'
        ).read())
        assert latest['width'] == payload['width']
        # unknown sid -> 400
        try:
            urllib.request.urlopen(f'{base}/contours.json?sid=nope&num=0')
            assert False, 'expected 400'
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def _write_fold_metrics(root, class_name='Lumen', folds=3, epochs=4, seed=0):
    rng = np.random.default_rng(seed)
    for fold in range(1, folds + 1):
        rows = []
        for epoch in range(1, epochs + 1):
            for split in ('train', 'test'):
                for cl in (class_name, 'Mean'):
                    rows.append({
                        'Epoch': epoch, 'Loss': 1.0 / epoch + rng.random() * 0.01,
                        'IoU': min(0.6 + 0.05 * epoch, 0.95),
                        'Dice': min(0.7 + 0.05 * epoch + rng.random() * 0.01, 0.99),
                        'Precision': 0.8, 'Recall': 0.8, 'F1': 0.8,
                        'Split': split, 'Class': cl,
                    })
        d = root / class_name / f'fold_{fold}'
        d.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(rows).to_csv(d / 'metrics.csv', index=False)
    return root / class_name


def test_draw_loss_plot(tmp_path):
    from octseg.core.config import Config
    from octseg.vis.draw_loss_plot import main

    class_dir = _write_fold_metrics(tmp_path / 'eval')
    save_dir = tmp_path / 'out'
    main(Config(class_dir=str(class_dir), save_dir=str(save_dir),
                train_metric='Loss', test_metric='Dice', dpi=72))
    assert (save_dir / 'Loss_Dice_Lumen.png').exists()


def test_draw_boxplots(tmp_path):
    from octseg.core.config import Config
    from octseg.vis.draw_boxplots import main

    d1 = _write_fold_metrics(tmp_path / 'eval', 'Lumen')
    d2 = _write_fold_metrics(tmp_path / 'eval', 'Vasa vasorum', seed=1)
    save_dir = tmp_path / 'out'
    main(Config(class_dirs=[str(d1), str(d2)], split='test', metric='Dice',
                save_dir=str(save_dir), dpi=72))
    assert (save_dir / 'Boxplot_Dice_test.png').exists()
    best = pd.read_csv(save_dir / 'best_metrics.csv')
    assert {'Lumen', 'Vasa vasorum', 'Mean'} >= set(best['Class'])
    assert 'Fold' in best.columns


def test_app_malformed_upload_survives(demo_dir):
    """A corrupt DICOM upload must come back as a 500 with the error text,
    and the server must keep serving other requests afterwards — the worker
    must never die on user input (reference app has no inference upload at
    all; this is octseg's working path)."""
    from octseg.analyze.app import serve
    from octseg.core.config import Config

    server = serve(
        Config(host='127.0.0.1', port=0, demo_dir=demo_dir), block=False
    )
    host, port = server.server_address
    try:
        base = f'http://{host}:{port}'
        req = urllib.request.Request(
            f'{base}/analyze?mode=inference', data=b'\x00garbage\xff' * 100,
            method='POST')
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 500
        # server still alive and functional
        req2 = urllib.request.Request(f'{base}/analyze?mode=demo',
                                      method='POST')
        info = json.loads(urllib.request.urlopen(req2).read())
        assert info['n_frames'] == 8
    finally:
        server.shutdown()
