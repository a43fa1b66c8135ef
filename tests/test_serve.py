"""Production inference service (octseg.infer.serve): transport encoding,
metrics, admission control, and the end-to-end HTTP surface.

The reference ships no serving API at all (its app's inference mode is a
stub, reference src/app/tools/analysis.py:138,166); this is the
machine-facing surface documented in docs/SERVING.md.
"""

import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

from octseg.infer.serve import Metrics, decode_block, encode_block


def test_encode_decode_block_roundtrip(rng):
    masks = (rng.random((3, 17, 23, 4)) > 0.6).astype(np.float32)
    rec = encode_block(masks)
    out = decode_block(rec, 3, 17, 23)
    np.testing.assert_array_equal(out, masks)


def test_encode_decode_block_partial_final_block(rng):
    # count * H * W * 4 not a multiple of 8: packbits pads, decode trims
    masks = (rng.random((1, 5, 7, 4)) > 0.5).astype(np.float32)
    out = decode_block(encode_block(masks), 1, 5, 7)
    np.testing.assert_array_equal(out, masks)


def test_metrics_prometheus_rendering():
    m = Metrics()
    m.count('pullback', 200)
    m.count('pullback', 200)
    m.count('healthz', 200)
    m.frames_total = 42
    text = m.render()
    assert 'octseg_requests_total{endpoint="pullback",status="200"} 2' in text
    assert 'octseg_frames_total 42' in text
    assert text.endswith('\n')
    # every non-comment line is "name{labels} value" or "name value"
    for line in text.strip().splitlines():
        if not line.startswith('#'):
            assert len(line.rsplit(' ', 1)) == 2


@pytest.fixture(scope='module')
def server(tmp_path_factory):
    from tests.test_infer import make_model_dir

    root = str(tmp_path_factory.mktemp('serve_models'))
    make_model_dir(root, 'LM', ['Lumen'])
    make_model_dir(root, 'FC_LC', ['Lipid core', 'Fibrous cap'])
    make_model_dir(root, 'VV', ['Vasa vasorum'])
    from octseg.core.config import Config
    from octseg.infer.serve import serve

    cfg = Config(
        host='127.0.0.1', port=0, models_dir=root,
        output_size=[48, 48], max_queued=0, block_size=8,
        classes=['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'],
    )
    httpd = serve(cfg, block=False)
    yield httpd
    httpd.shutdown()


def _url(server, path):
    host, port = server.server_address
    return f'http://{host}:{port}{path}'


def _dicom_bytes(rng, n=5, size=64):
    import os
    import tempfile

    from octseg.data import dicom

    frames = rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)
    fd, path = tempfile.mkstemp()
    os.close(fd)
    dicom.dcmwrite(path, frames)
    with open(path, 'rb') as f:
        body = f.read()
    os.unlink(path)
    return frames, body


@pytest.mark.slow
def test_serve_healthz_and_routes(server):
    with urllib.request.urlopen(_url(server, '/healthz')) as r:
        health = json.loads(r.read())
    assert health['status'] == 'ok'
    assert sorted(health['models']) == ['FC_LC', 'LM', 'VV']
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(server, '/nope'))
    assert e.value.code == 404


@pytest.mark.slow
def test_serve_pullback_masks_stream_matches_engine(server, rng):
    frames, body = _dicom_bytes(rng)
    req = urllib.request.Request(_url(server, '/v1/pullback'), data=body,
                                 method='POST')
    with urllib.request.urlopen(req) as r:
        assert r.headers['Content-Type'] == 'application/x-ndjson'
        lines = [json.loads(ln) for ln in r.read().splitlines()]
    header, blocks, end = lines[0], lines[1:-1], lines[-1]
    assert header['type'] == 'header' and header['frames'] == 5
    assert end['type'] == 'end' and end['frames'] == 5
    got = np.zeros((5, 48, 48, 4), np.float32)
    for b in blocks:
        assert b['type'] == 'block'
        got[b['start']:b['start'] + b['count']] = decode_block(
            b, b['count'], header['height'], header['width'])
    expect = server.octseg_state.engine.segment_pullback(frames, [48, 48])
    np.testing.assert_array_equal(got, expect)
    # metrics moved
    with urllib.request.urlopen(_url(server, '/metrics')) as r:
        text = r.read().decode()
    assert 'octseg_requests_total{endpoint="pullback",status="200"}' in text
    assert 'octseg_frames_total' in text


@pytest.mark.slow
def test_serve_pullback_quant(server, rng):
    frames, body = _dicom_bytes(rng)
    req = urllib.request.Request(_url(server, '/v1/pullback?format=quant'),
                                 data=body, method='POST')
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    assert payload['frames'] == 5
    # ratio comes from the OUTPUT resolution the masks are quantified at
    assert payload['ratio'] == max(1, 48 * 150 // 1000)
    assert set(payload['objects']) == {
        'Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'}
    # random-weight models produce some mask somewhere; rows are aligned
    for obj in payload['objects'].values():
        n = len(obj['slice'])
        assert (len(obj['area']) == len(obj['object_id'])
                == len(obj['thickness_mean']) == len(obj['thickness_min']) == n)
        assert all(0 <= s < 5 for s in obj['slice'])


@pytest.mark.slow
def test_serve_quant_rows_match_analyzer_math(server, rng):
    """quant output reproduces get_analysis's numbers for the same masks."""
    from octseg.analyze.analysis import quantify_frame
    from octseg.infer.serve import quantify_pullback

    frames, _body = _dicom_bytes(rng)
    state = server.octseg_state
    payload = quantify_pullback(state, frames)
    masks = state.engine.segment_pullback(frames, [48, 48]).astype(np.uint8)
    ratio = max(1, 48 * 150 // 1000)
    from octseg.core.registry import CLASS_IDS

    for class_name, obj in payload['objects'].items():
        ch = CLASS_IDS[class_name] - 1
        # analyzer presence rule: binary with BOTH values present (an
        # all-set mask is skipped, get_analysis's unique!=2 check)
        expect_slices = [i for i in range(5)
                         if masks[i, :, :, ch].any()
                         and not masks[i, :, :, ch].all()]
        assert obj['slice'] == expect_slices
        for row, idx in enumerate(expect_slices):
            q = quantify_frame(masks[idx, :, :, ch] * 255, ratio)
            assert obj['area'][row] == pytest.approx(q['area'])
            assert obj['thickness_mean'][row] == pytest.approx(q['thickness_mean'])


@pytest.mark.slow
def test_serve_admission_control_503(server, rng):
    """max_queued=0: while one job holds admission, a second gets 503."""
    state = server.octseg_state
    assert state.admit()  # simulate an in-flight job
    try:
        _frames, body = _dicom_bytes(rng, n=2)
        req = urllib.request.Request(_url(server, '/v1/pullback'), data=body,
                                     method='POST')
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 503
        assert e.value.headers['Retry-After']
    finally:
        state.release()
    # after release the service admits again
    frames, body = _dicom_bytes(rng, n=2)
    req = urllib.request.Request(_url(server, '/v1/pullback'), data=body,
                                 method='POST')
    with urllib.request.urlopen(req) as r:
        lines = [json.loads(ln) for ln in r.read().splitlines()]
    assert lines[-1]['type'] == 'end'


@pytest.mark.slow
def test_client_end_to_end(server, rng, tmp_path):
    """octseg.infer.client drives the service and writes the predict
    contract (overlay/mask PNG pair per frame) from the streamed blocks."""
    import os

    from octseg.core.config import Config
    from octseg.data import dicom
    from octseg.infer.client import run

    frames = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    dcm_path = str(tmp_path / 'IMG009')
    dicom.dcmwrite(dcm_path, frames)
    host, port = server.server_address
    save_dir = str(tmp_path / 'client_out')
    cfg = Config(server_url=f'http://{host}:{port}', dcm_path=dcm_path,
                 save_dir=save_dir, format='masks',
                 classes=['Lumen', 'Fibrous cap', 'Lipid core',
                          'Vasa vasorum'])
    assert run(cfg) == 3
    outs = sorted(os.listdir(save_dir))
    assert len(outs) == 6  # 3 frames x (mask + overlay)
    assert 'IMG009_1_overlay.png' in outs and 'IMG009_3_mask.png' in outs

    # quant mode writes one JSON
    qdir = str(tmp_path / 'client_quant')
    cfg = Config(server_url=f'http://{host}:{port}', dcm_path=dcm_path,
                 save_dir=qdir, format='quant',
                 classes=['Lumen', 'Fibrous cap', 'Lipid core',
                          'Vasa vasorum'])
    assert run(cfg) == 3
    payload = json.load(open(os.path.join(qdir, 'quant.json')))
    assert payload['frames'] == 3


def test_client_quant_mode_never_imports_engine(tmp_path):
    """The client's quant mode stays off the engine/jax import chain, so it
    runs on a workstation with no TPU stack (on this rig jax itself is
    preloaded by sitecustomize — module-chain presence is the testable
    property)."""
    import subprocess
    import sys as _sys

    code = (
        "import sys, tempfile\n"
        "import octseg.infer.client as client\n"
        "from octseg.core.config import Config\n"
        "def fake(server_url, dcm_path, fmt='masks', timeout=0):\n"
        "    yield {'frames': 1, 'ratio': 9, 'objects': {}}\n"
        "client.stream_pullback = fake\n"
        "client.run(Config(server_url='http://x', dcm_path='/dev/null',\n"
        "           save_dir=tempfile.mkdtemp(), format='quant', classes=[]))\n"
        "assert 'octseg.infer.engine' not in sys.modules\n"
        "assert 'octseg.infer.predict' not in sys.modules\n"
    )
    # generous: the subprocess pays a cold jax import on a 1-core rig that
    # may be saturated by the rest of the suite (observed >300s under load)
    # cwd-independent: octseg is not pip-installed, so the child must resolve
    # it via PYTHONPATH (another test chdir-ing away must not break this)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    subprocess.run([_sys.executable, '-c', code], check=True, timeout=900,
                   env=env)


def test_client_raises_on_truncated_stream(tmp_path, rng, monkeypatch):
    """A stream that closes without the 'end' record (server died
    mid-pullback) is a loud RuntimeError, not exit-0 with partial PNGs."""
    import octseg.infer.client as client_mod
    from octseg.core.config import Config
    from octseg.data import dicom

    frames = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    dcm_path = str(tmp_path / 'IMG010')
    dicom.dcmwrite(dcm_path, frames)

    def fake_stream(server_url, dcm_path, fmt='masks', timeout=3600.0):
        yield {'type': 'header', 'frames': 2, 'height': 32, 'width': 32,
               'classes': [], 'encoding': 'packbits'}
        # connection drops: no block, no end record

    monkeypatch.setattr(client_mod, 'stream_pullback', fake_stream)
    cfg = Config(server_url='http://x', dcm_path=dcm_path,
                 save_dir=str(tmp_path / 'out'), format='masks', classes=[])
    with pytest.raises(RuntimeError, match='truncated'):
        client_mod.run(cfg)


@pytest.mark.slow
def test_serve_rejects_bad_requests(server):
    # unknown format
    req = urllib.request.Request(_url(server, '/v1/pullback?format=xml'),
                                 data=b'x', method='POST')
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # malformed DICOM body → clean 500, server stays up
    req = urllib.request.Request(_url(server, '/v1/pullback'),
                                 data=b'not a dicom', method='POST')
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 500
    with urllib.request.urlopen(_url(server, '/healthz')) as r:
        assert json.loads(r.read())['status'] == 'ok'
