import functools
import json
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from octseg.train.checkpoint import save_weights


def make_model_dir(root, name, classes, arch='Unet', encoder='resnet18', input_size=64):
    from octseg.models import create_model

    model_dir = os.path.join(root, name)
    os.makedirs(model_dir, exist_ok=True)
    model = create_model(arch, encoder, classes=len(classes))
    sample = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(hash(name) % 2**31), 'dropout': jax.random.PRNGKey(0)},
        sample, train=False,
    )
    save_weights(os.path.join(model_dir, 'weights.ckpt'),
                 variables['params'], variables['batch_stats'])
    with open(os.path.join(model_dir, 'config.json'), 'w') as f:
        json.dump({
            'model_name': f'{arch}_{encoder}',
            'architecture': arch,
            'encoder': encoder,
            'input_size': input_size,
            'classes': list(classes),
            'batch_size': 4,
            'optimizer': 'Adam',
            'lr': 1e-4,
        }, f)
    return model_dir


@pytest.fixture(scope='module')
def models_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('models'))
    make_model_dir(root, 'LM', ['Lumen'])
    make_model_dir(root, 'FC_LC', ['Lipid core', 'Fibrous cap'])
    make_model_dir(root, 'VV', ['Vasa vasorum'])
    return root


def test_engine_routing_and_shapes(models_dir, rng):
    from octseg.infer.engine import InferenceEngine

    images = [
        Image.fromarray(rng.integers(0, 255, (100, 100, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    masks = [np.zeros((80, 80, 4)) for _ in images]
    engine = InferenceEngine(models_dir, classes=[
        'Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum',
    ], block_size=4)
    out = engine.segment(images, masks, output_size=[80, 80])
    assert len(out) == 5
    for m in out:
        assert m.shape == (80, 80, 4)
        assert set(np.unique(m)) <= {0.0, 1.0}

    # channel routing parity: Fibrous cap = FC_LC output channel 1, into
    # mask channel CLASS_IDS['Fibrous cap']-1 == 1
    pred = engine.run_model('FC_LC', images, [80, 80])
    np.testing.assert_array_equal(out[0][:, :, 1], pred[0][:, :, 1])
    np.testing.assert_array_equal(out[0][:, :, 2], pred[0][:, :, 0])


def test_engine_matches_unbatched_reference_semantics(models_dir, rng):
    """Block-batched sharded inference == per-frame computation (in the
    reference-parity output mode: NEAREST on the thresholded mask,
    reference src/predict.py:92-100)."""
    from octseg.data.utils import preprocessing_img
    from octseg.infer.engine import InferenceEngine, load_model_bundle
    from octseg.ops.resize import resize_nearest

    images = [
        Image.fromarray(rng.integers(0, 255, (90, 90, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    engine = InferenceEngine(models_dir, classes=['Lumen'], block_size=8,
                             output_resize='nearest')
    batched = engine.run_model('LM', images, [64, 64])

    model, variables, model_cfg = load_model_bundle(os.path.join(models_dir, 'LM'))
    for i, img in enumerate(images):
        x = preprocessing_img(img.copy(), model_cfg['input_size']).astype(np.float32)
        logits = model.apply(variables, jnp.asarray(x[None]), train=False)
        ref = (np.asarray(jax.nn.sigmoid(logits[0])) > 0.5).astype(np.float32)
        ref = np.asarray(resize_nearest(jnp.asarray(ref), (64, 64)))
        np.testing.assert_array_equal(batched[i], ref)


def test_engine_prob_bilinear_output_mode(models_dir, rng):
    """The default output mode resizes sigmoid PROBABILITIES bilinearly to
    the output size, then thresholds — at output == input size it must equal
    the nearest mode exactly; at other sizes it must match a per-frame
    recomputation."""
    from octseg.data.utils import preprocessing_img
    from octseg.infer.engine import InferenceEngine, load_model_bundle
    from octseg.ops.resize import resize_bilinear

    images = [
        Image.fromarray(rng.integers(0, 255, (90, 90, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    smooth = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    assert smooth.output_resize == 'prob_bilinear'
    parity = InferenceEngine(models_dir, classes=['Lumen'], block_size=8,
                             output_resize='nearest')
    same_size = smooth.run_model('LM', images, [64, 64])  # == input_size
    np.testing.assert_array_equal(
        same_size, parity.run_model('LM', images, [64, 64]))

    up = smooth.run_model('LM', images, [80, 80])
    model, variables, model_cfg = load_model_bundle(os.path.join(models_dir, 'LM'))
    for i, img in enumerate(images):
        x = preprocessing_img(img.copy(), model_cfg['input_size']).astype(np.float32)
        logits = model.apply(variables, jnp.asarray(x[None]), train=False)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        ref = (np.asarray(resize_bilinear(probs, (80, 80)))[0] > 0.5)
        np.testing.assert_array_equal(up[i], ref.astype(np.float32))

    with pytest.raises(ValueError, match='output_resize'):
        InferenceEngine(models_dir, classes=['Lumen'], output_resize='cubic')


def test_save_results_reference_parity(rng, tmp_path):
    """Byte parity of overlays with a direct cv2+PIL transcription of the
    reference postprocessing chain (src/data/utils.py:195-235)."""
    from octseg.core.registry import CLASS_COLORS_RGB, CLASS_IDS
    from octseg.data.utils import save_results

    h = w = 96
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    mask = np.zeros((h, w, 4))
    mask[20:50, 30:70, 0] = 1.0  # Lumen blob
    mask[60:80, 10:40, 3] = 1.0  # VV blob
    classes = ['Lumen', 'Vasa vasorum']

    ours_dir = tmp_path / 'ours'
    save_results([img.copy()], [mask.copy()], ['t'], classes, str(ours_dir))

    # --- reference chain, transcribed verbatim with cv2 + PIL ---
    def union_pil(img, m, color, alpha=0.85):
        m = m * alpha * 255
        class_img = Image.new('RGB', size=img.size, color=color)
        img.paste(class_img, (0, 0), Image.fromarray(m.astype('uint8')))
        return img

    ref_img = img.copy()
    ref_color_mask = Image.new('RGB', size=ref_img.size, color=(128, 128, 128))
    for class_name in classes:
        m = mask[:, :, CLASS_IDS[class_name] - 1]
        m = cv2.morphologyEx(
            m, cv2.MORPH_CLOSE, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5)), 3
        )
        m_d = cv2.dilate(m.copy(), cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7)))
        m_e = cv2.erode(m.copy(), cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7)))
        m = cv2.GaussianBlur(m, (5, 5), 0)
        m_d[m_e > 0] = 0
        ref_img = union_pil(ref_img, m * 64, CLASS_COLORS_RGB[class_name])
        ref_img = union_pil(ref_img, m_d * 255, CLASS_COLORS_RGB[class_name])
        m255 = mask[:, :, CLASS_IDS[class_name] - 1] * 255
        class_img = Image.new('RGB', size=ref_img.size, color=CLASS_COLORS_RGB[class_name])
        ref_color_mask.paste(class_img, (0, 0), Image.fromarray(m255).convert('L'))

    ours_overlay = np.array(Image.open(ours_dir / 't_overlay.png'))
    ours_mask = np.array(Image.open(ours_dir / 't_mask.png'))
    np.testing.assert_array_equal(ours_mask, np.array(ref_color_mask))
    # blur differences of ~2e-3 shift the wrapped alpha by at most 1 level;
    # require near-identity with a tiny tolerance
    diff = np.abs(ours_overlay.astype(int) - np.array(ref_img).astype(int))
    assert diff.max() <= 2, f'overlay max diff {diff.max()}'
    assert (diff > 0).mean() < 0.01


def test_predict_entry_point(models_dir, tmp_path, reference_dir):
    """End-to-end: reference demo PNGs → hybrid ensemble → overlay PNGs."""
    from octseg.core.config import Config
    from octseg.infer.predict import main

    save_dir = str(tmp_path / 'out')
    cfg = Config(
        data_dir=f'{reference_dir}/data/demo/input',
        models_dir=models_dir,
        save_dir=save_dir,
        output_size=[256, 256],
        device='auto',
        block_size=8,
        classes=['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'],
    )
    main(cfg)
    outs = sorted(os.listdir(save_dir))
    assert '001_1_007_mask.png' in outs and '001_1_007_overlay.png' in outs
    assert len(outs) == 6  # 3 inputs × (mask + overlay)
    overlay = np.array(Image.open(os.path.join(save_dir, '001_1_007_overlay.png')))
    assert overlay.shape == (256, 256, 3)


@pytest.mark.heavy  # compiles probe programs at block 64/32/16 by design
def test_block_sizing_halves_under_tight_budget(tmp_path, monkeypatch):
    """_block_for must halve the block until the program fits the HBM budget
    (per XLA memory_analysis) and floor at the mesh size."""
    from octseg.infer.engine import InferenceEngine
    from octseg.train.checkpoint import initialize_model_dir

    initialize_model_dir(str(tmp_path / 'LM'), ['Lumen'],
                         arch='Unet', encoder='resnet18', input_size=64)
    eng = InferenceEngine(str(tmp_path), ['Lumen'], block_size=64)
    # a budget nothing fits: refuse loudly rather than execute a program
    # memory_analysis rejected (a live OOM through the relay kills clients)
    monkeypatch.setattr(eng, 'HBM_BUDGET', 1)
    fn, variables, _cfg = eng._forward_fn('LM', 64, 64)
    with pytest.raises(RuntimeError, match='does not fit the HBM budget'):
        eng._block_for('LM', fn, variables, (64, 64, 64, 3), 'float32')

    eng2 = InferenceEngine(str(tmp_path), ['Lumen'], block_size=64)
    fn2, v2, _ = eng2._forward_fn('LM', 64, 64)
    bs2, _ = eng2._block_for('LM', fn2, v2, (64, 64, 64, 3), 'float32')
    assert bs2 == eng2.block_size  # generous budget: full block

    # a budget that fits the half block but not the full one: the sizing
    # loop halves exactly once (needs measured from XLA's own analysis)
    import jax as _jax

    def need_at(eng, fn, v, bs):
        _ok, compiled = eng._fits(
            fn, v, (_jax.ShapeDtypeStruct((bs, 64, 64, 3), 'float32'),))
        try:
            m = compiled.memory_analysis()
            return (m.temp_size_in_bytes + m.argument_size_in_bytes
                    + m.output_size_in_bytes)
        except Exception:
            return None

    need64 = need_at(eng2, fn2, v2, 64)
    need32 = need_at(eng2, fn2, v2, 32)
    if need64 and need32 and need32 < need64:
        eng3 = InferenceEngine(str(tmp_path), ['Lumen'], block_size=64)
        fn3, v3, _ = eng3._forward_fn('LM', 64, 64)
        monkeypatch.setattr(
            eng3, 'HBM_BUDGET',
            eng3._resident_bytes() + (need32 + need64) // 2)
        bs3, _ = eng3._block_for('LM', fn3, v3, (64, 64, 64, 3), 'float32')
        assert bs3 == 32


def test_block_cache_keyed_on_output_size(models_dir, rng):
    """A runner compiled for one output size must not be reused for another:
    it would execute cleanly and return wrong-shape masks (the _blocks cache
    used to key only on (model, frame shape, dtype, budget))."""
    from octseg.infer.engine import InferenceEngine

    images = [
        Image.fromarray(rng.integers(0, 255, (100, 100, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    engine = InferenceEngine(models_dir, classes=['Lumen'], block_size=4)
    out_a = engine.run_model('LM', images, [80, 80])
    out_b = engine.run_model('LM', images, [56, 72])
    assert out_a.shape[1:3] == (80, 80)
    assert out_b.shape[1:3] == (56, 72)

    # same via the pullback fast path (device preprocess variant)
    frames = rng.integers(0, 255, (3, 100, 100, 3), dtype=np.uint8)
    pa = engine.segment_pullback(frames, [80, 80])
    pb = engine.segment_pullback(frames, [56, 72])
    assert pa.shape[1:3] == (80, 80) and pb.shape[1:3] == (56, 72)


def test_engine_is_garbage_collectable(models_dir):
    """Engines must not be pinned by class-level caches (the analyze app
    builds one per upload; leaked engines pin device-resident params)."""
    import gc
    import weakref

    from octseg.infer.engine import InferenceEngine

    engine = InferenceEngine(models_dir, classes=['Lumen'], block_size=4)
    engine.run_model('LM', [Image.new('RGB', (64, 64))], [64, 64])
    ref = weakref.ref(engine)
    del engine
    gc.collect()
    assert ref() is None, 'InferenceEngine leaked (held by a global cache)'


@pytest.mark.heavy  # int8 is opt-in and parked (benchmarks/int8_*.json); quantize unit tests stay fast
def test_engine_int8_flag_end_to_end(models_dir, rng):
    """The opt-in int8 engine mode must produce valid masks through the
    full routing path and stay close to the exact path (accuracy artifact:
    eval/synth_fullscale/int8_accuracy.json, max |dDice| 5.4e-05)."""
    from octseg.infer.engine import InferenceEngine

    images = [
        Image.fromarray(rng.integers(0, 255, (72, 72, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    masks = [np.zeros((64, 64, 4)) for _ in images]
    exact = InferenceEngine(models_dir, classes=['Lumen'], block_size=4)
    quant = InferenceEngine(models_dir, classes=['Lumen'], block_size=4,
                            int8=True)
    out_e = exact.segment(images, list(masks), output_size=[64, 64])
    out_q = quant.segment(images, list(masks), output_size=[64, 64])
    assert len(out_q) == 3
    for me, mq in zip(out_e, out_q):
        assert mq.shape == me.shape
        assert set(np.unique(mq)) <= {0.0, 1.0}
        # sigmoid(logit)>0.5 decisions flip only near the boundary; the two
        # paths must agree on the overwhelming majority of pixels
        agree = float((me == mq).mean())
        assert agree > 0.98, agree


@pytest.mark.heavy  # AOT key gating covered fast by test_aot_key_gates_platform_and_block; TPU artifact benchmarks/aot_cold_start.json
def test_aot_export_roundtrip_and_hit(models_dir, rng, monkeypatch):
    """engine.export_aot writes a jax.export artifact; a fresh engine must
    serve from it — no memory probing, no silent jit fallback — and
    reproduce the traced path's masks exactly. OCTSEG_AOT=0 disables."""
    import shutil

    from octseg.infer.engine import InferenceEngine

    frames = rng.integers(0, 255, (10, 48, 48, 3), dtype=np.uint8)
    e1 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    ref = e1.segment_pullback(frames, output_size=[32, 32])
    paths = e1.export_aot('LM', [32, 32], frame_hw=[48, 48])
    assert paths and all(os.path.exists(p) for p in paths)

    # serving engine: forbid the sizing probe, and run the AOT program
    # directly (no fallback) so an exported-program failure raises here
    def no_probe(self, *a, **k):
        raise AssertionError('memory probe used despite AOT artifact')

    def direct_run(runner, fn, variables, chunk):
        assert runner is not None, 'AOT runner missing'
        return runner(variables, chunk)

    monkeypatch.setattr(InferenceEngine, '_fits', no_probe)
    monkeypatch.setattr(InferenceEngine, '_run', staticmethod(direct_run))
    e2 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    out = e2.segment_pullback(frames, output_size=[32, 32])
    np.testing.assert_array_equal(out, ref)

    # a mismatched configuration (different output size) must NOT hit
    e3 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    with pytest.raises(AssertionError, match='memory probe'):
        e3.segment_pullback(frames, output_size=[40, 40])

    # kill switch
    monkeypatch.setenv('OCTSEG_AOT', '0')
    e4 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    with pytest.raises(AssertionError, match='memory probe'):
        e4.segment_pullback(frames, output_size=[32, 32])
    monkeypatch.delenv('OCTSEG_AOT')

    # corrupt artifacts (both flavors): never fatal — engine falls back to
    # normal sizing
    monkeypatch.undo()
    aot_dir = os.path.join(models_dir, 'LM', 'aot')
    for fname in os.listdir(aot_dir):
        if fname.endswith(('.jaxexp', '.pjrtexe')):
            with open(os.path.join(aot_dir, fname), 'wb') as f:
                f.write(b'not an export')
    e5 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    out5 = e5.segment_pullback(frames, output_size=[32, 32])
    np.testing.assert_array_equal(out5, ref)
    shutil.rmtree(aot_dir)


def test_pullback_mono_fast_path_parity(models_dir, rng):
    """Grayscale-replicated RGB pullbacks take the single-channel upload
    path (3x less relay transfer); masks must match the RGB path exactly.
    A jnp input skips host-side mono detection, forcing the RGB program."""
    from octseg.infer.engine import InferenceEngine

    gray = rng.integers(0, 255, (6, 48, 48, 1), dtype=np.uint8)
    rgb = np.repeat(gray, 3, axis=-1)
    engine = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    ref = engine.segment_pullback(jnp.asarray(rgb), output_size=[32, 32])

    called = {}
    orig = jax.device_put

    def spy(x, *a, **k):
        if hasattr(x, 'shape') and getattr(x, 'ndim', 0) == 4:
            called.setdefault('ch', []).append(x.shape[-1])
        return orig(x, *a, **k)

    try:
        jax.device_put = spy
        out = engine.segment_pullback(rgb, output_size=[32, 32])
        out_mono = engine.segment_pullback(gray, output_size=[32, 32])
    finally:
        jax.device_put = orig
    # the replicated-RGB pullback and the explicit (N,H,W,1) input must
    # both have uploaded single-channel frames
    assert called['ch'] and all(c == 1 for c in called['ch']), called
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out_mono, ref)

    # a genuinely colored pullback must NOT take the mono path
    color = rgb.copy()
    color[0, 0, 0, 2] ^= 1
    called.clear()
    try:
        jax.device_put = spy
        out_c = engine.segment_pullback(color, output_size=[32, 32])
    finally:
        jax.device_put = orig
    assert called['ch'] and all(c == 3 for c in called['ch']), called
    assert out_c.shape == ref.shape


def test_iter_pullback_streams_blocks_matching_batch_path(models_dir, rng):
    """iter_pullback must yield engine-block-sized mask chunks, in frame
    order, whose concatenation equals segment_pullback exactly — including
    a ragged final block — while running every model on every block."""
    from octseg.infer.engine import InferenceEngine

    frames = rng.integers(0, 255, (19, 48, 48, 3), dtype=np.uint8)
    engine = InferenceEngine(
        models_dir, classes=['Lumen', 'Fibrous cap', 'Lipid core',
                             'Vasa vasorum'], block_size=8)
    ref = engine.segment_pullback(frames, output_size=[32, 32])

    starts, chunks = [], []
    for start, block in engine.iter_pullback(frames, output_size=[32, 32]):
        starts.append(start)
        chunks.append(block)
    assert starts == [0, 8, 16]
    assert [c.shape[0] for c in chunks] == [8, 8, 3]
    assert all(c.shape[1:] == (32, 32, 4) for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), ref)

    # empty pullback: no yields, no crash
    assert list(engine.iter_pullback(frames[:0], output_size=[32, 32])) == []


def test_aot_key_gates_platform_and_block(models_dir, rng, tmp_path):
    """Artifacts from another platform/device kind must not hit (they would
    bypass the HBM probe); incompatible-block artifacts are rejected from
    the meta JSON alone, before any deserialize."""
    import json

    from octseg.infer import aot

    frames = rng.integers(0, 255, (8, 48, 48, 3), dtype=np.uint8)
    from octseg.infer.engine import InferenceEngine

    e1 = InferenceEngine(models_dir, classes=['Lumen'], block_size=8)
    e1.segment_pullback(frames, output_size=[32, 32])
    paths = e1.export_aot('LM', [32, 32], frame_hw=[48, 48])
    model_dir = os.path.join(models_dir, 'LM')
    key = json.load(open(paths[0][:-len('jaxexp')] + 'json'))['key']

    assert aot.load_runner(model_dir, key) is not None
    # block_divides: stored block (8) must divide the engine block
    assert aot.load_runner(model_dir, key, block_divides=8) is not None
    assert aot.load_runner(model_dir, key, block_divides=4) is None
    assert aot.load_runner(model_dir, key, block_divides=12) is None

    # platform mismatch: same key except device identity -> no hit
    foreign = dict(key, platform='gpu', device_kind='H100')
    assert aot.load_runner(model_dir, foreign) is None

    # and an on-disk artifact from a foreign platform never matches a local
    # key (the stored key differs in platform/device_kind)
    meta_path = paths[0][:-len('jaxexp')] + 'json'
    meta = json.load(open(meta_path))
    meta['key']['platform'] = 'gpu'
    meta['key']['device_kind'] = 'H100'
    with open(meta_path, 'w') as f:
        json.dump(meta, f)
    assert aot.load_runner(model_dir, key) is None
    import shutil

    shutil.rmtree(os.path.join(model_dir, aot.AOT_DIRNAME))


def test_predict_entry_point_dicom_pullback(models_dir, tmp_path, rng):
    """data_dir pointing at a DICOM pullback streams through iter_pullback
    and writes the same overlay/mask PNG contract, one pair per frame."""
    from octseg.core.config import Config
    from octseg.data import dicom
    from octseg.infer.predict import main

    frames = rng.integers(0, 255, (5, 64, 64), dtype=np.uint8)  # grayscale
    dcm_path = str(tmp_path / 'IMG001')
    dicom.dcmwrite(dcm_path, frames)
    save_dir = str(tmp_path / 'out')
    cfg = Config(
        data_dir=dcm_path,
        models_dir=models_dir,
        save_dir=save_dir,
        output_size=[48, 48],
        device='auto',
        block_size=8,
        classes=['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'],
    )
    main(cfg)
    outs = sorted(os.listdir(save_dir))
    assert len(outs) == 10  # 5 frames x (mask + overlay)
    assert 'IMG001_1_overlay.png' in outs and 'IMG001_5_mask.png' in outs
    overlay = np.array(Image.open(os.path.join(save_dir, 'IMG001_1_overlay.png')))
    assert overlay.shape == (48, 48, 3)


def test_predict_dicom_16bit_normalizes_per_slice(models_dir, tmp_path, rng,
                                                  monkeypatch):
    """Non-uint8 pullbacks are per-slice min-max normalized — the same
    transform the data-prep chain applied to every training frame
    (octseg.data.convert_dicoms; reference src/data/convert_dicoms.py:73-80)
    — not globally peak-scaled."""
    import octseg.infer.predict as predict_mod
    from octseg.core.config import Config
    from octseg.data.convert_dicoms import normalize_slice

    # slice 0 spans a dim range, slice 1 is bright: per-slice normalization
    # stretches both to the full 0..255 range; global peak scaling would not
    frames16 = np.stack([
        rng.integers(100, 900, (64, 64)).astype(np.uint16),
        rng.integers(30000, 60000, (64, 64)).astype(np.uint16),
    ])
    seen = {}

    class _DS:
        pixel_array = frames16

    monkeypatch.setattr(predict_mod, '_is_dicom', lambda p: True)
    monkeypatch.setattr('octseg.data.dicom.dcmread', lambda p: _DS())

    orig_iter = predict_mod.InferenceEngine.iter_pullback

    def spy(self, frames, output_size):
        seen['frames'] = np.asarray(frames)
        return orig_iter(self, frames, output_size)

    monkeypatch.setattr(predict_mod.InferenceEngine, 'iter_pullback', spy)
    save_dir = str(tmp_path / 'out16')
    cfg = Config(
        data_dir=str(tmp_path / 'IMG016'),
        models_dir=models_dir,
        save_dir=save_dir,
        output_size=[48, 48],
        device='auto',
        block_size=8,
        classes=['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'],
    )
    predict_mod.main(cfg)
    got = seen['frames'][..., 0]
    expect = np.stack([normalize_slice(f) for f in frames16])
    np.testing.assert_array_equal(got, expect)
    assert got[0].min() == 0 and got[0].max() == 255  # both slices stretched
    assert got[1].min() == 0 and got[1].max() == 255
    assert len(os.listdir(save_dir)) == 4  # 2 frames x (mask + overlay)
