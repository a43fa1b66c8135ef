"""Device-resident batched inference engine with frame-axis sharding.

Replaces the reference's per-frame, per-class host loop (reference:
src/predict.py:85-100 — one host→device→host round trip per frame per class)
with whole-pullback batching: frames are padded to a static block size,
sharded over the ICI mesh along the frame axis (the OCT analog of sequence
parallelism, SURVEY.md §5), and stay on device through forward + sigmoid
threshold + nearest resize to output size. One host sync per model.

Parity notes: the reference's predict() bypasses mean/std normalization
(calls self.model, not forward — src/models/smp/model.py:183-200, SURVEY §2.2)
and feeds BGR uint8-valued floats; both quirks are preserved so checkpoints
behave identically.
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from octseg.data.utils import preprocessing_img
from octseg.models import create_model
from octseg.ops.bitpack import pack_mask_bits, unpack_mask_bits, unpack_route_into
from octseg.ops.normalize import normalize_imagenet, sigmoid_threshold
from octseg.ops.resize import resize_bilinear, resize_nearest
from octseg.parallel.sharding import batch_sharding, make_mesh, replicated_sharding
from octseg.train.checkpoint import restore_weights_into

log = logging.getLogger(__name__)

# Routing table: class -> (model dir, output channel). Reference contract
# (src/predict.py:23-28).
MODELS_META = {
    'Lumen': {'model_dir': 'LM', 'index': 0},
    'Lipid core': {'model_dir': 'FC_LC', 'index': 0},
    'Fibrous cap': {'model_dir': 'FC_LC', 'index': 1},
    'Vasa vasorum': {'model_dir': 'VV', 'index': 0},
}


def load_model_bundle(model_dir: str, compute_dtype=None) -> Tuple[object, dict, dict]:
    """Load (model, variables, config) from a reference-layout model dir
    (config.json + weights.ckpt). compute_dtype=jnp.bfloat16 enables mixed
    precision (params stay fp32; logits fp32)."""
    with open(os.path.join(model_dir, 'config.json')) as f:
        model_cfg = json.load(f)
    model = create_model(
        model_cfg['architecture'],
        model_cfg['encoder'],
        in_channels=3,
        classes=len(model_cfg['classes']),
        dtype=compute_dtype or jnp.float32,
    )
    sample = jnp.zeros((1, model_cfg['input_size'], model_cfg['input_size'], 3), jnp.float32)
    abstract = jax.eval_shape(
        functools.partial(model.init, train=False),
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(0)},
        sample,
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
    variables = restore_weights_into(
        template, os.path.join(model_dir, 'weights.ckpt')
    )
    return model, variables, model_cfg


class InferenceEngine:
    """Hybrid per-feature ensemble predictor over a device mesh."""

    def __init__(
        self,
        models_dir: str,
        classes: Sequence[str],
        block_size: int = 128,  # measured knee of the throughput curve on v5e
        mesh=None,
        bf16: bool = False,  # mixed-precision compute (fp32 params/logits)
        int8: bool = False,  # int8 MXU convs (octseg/ops/quantize.py), opt-in
        output_resize: str = 'prob_bilinear',
    ):
        # output_resize: how model-resolution predictions become output-size
        # masks. 'prob_bilinear' (default): bilinear-resize the sigmoid
        # probabilities, then threshold at 0.5 — strictly more faithful when
        # output_size != input_size (a NEAREST downsize of a thin binary
        # structure drops/doubles boundary rows; measured on the demo
        # pullback it costs Fibrous cap ~0.05-0.1 micro-Dice,
        # eval/demo_realdata/gap_attribution.json). 'nearest': the
        # reference's contract (cv2.resize NEAREST on the binary mask,
        # src/predict.py:92-100), kept for behavioral parity runs.
        if output_resize not in ('prob_bilinear', 'nearest'):
            raise ValueError(f'unknown output_resize mode: {output_resize!r}')
        self.output_resize = output_resize
        self.classes = list(classes)
        self.models_dir = models_dir
        self.compute_dtype = jnp.bfloat16 if bf16 else None
        self.int8 = bool(int8)
        self.mesh = mesh or make_mesh()
        self.n_devices = self.mesh.devices.size
        # block size: static frame-chunk per forward = mesh size x a power of
        # two, so memory-driven halving (_block_for) always yields divisors
        # of the full block — chunked slicing stays exact
        quota = max(block_size // self.n_devices, 1)
        quota = 1 << (quota.bit_length() - 1)
        self.block_size = quota * self.n_devices
        self._bundles: Dict[str, tuple] = {}
        self._blocks: Dict[tuple, int] = {}
        # per-instance caches (a class-level lru_cache would key on self and
        # pin every engine's device-resident params forever — the analyze app
        # builds an engine per upload)
        self._fns: Dict[tuple, tuple] = {}
        self._slicers: Dict[int, object] = {}

    def _bundle(self, model_dir_name: str):
        if model_dir_name not in self._bundles:
            path = os.path.join(self.models_dir, model_dir_name)
            self._bundles[model_dir_name] = load_model_bundle(path, self.compute_dtype)
            log.info('Loaded model %s', path)
        return self._bundles[model_dir_name]

    # HBM budget per chip for one model's execution (args + temps + outputs)
    # PLUS resident buffers (the uploaded pullback, every loaded model's
    # replicated params); v5e has 15.75 GB usable minus runtime reservations
    # and XLA arena fragmentation (~13% observed on big programs)
    HBM_BUDGET = 14.2 * 2 ** 30

    def _resident_bytes(self) -> int:
        """Device bytes held across executions: all loaded models' params."""
        import numpy as _np

        total = 0
        for _model, variables, _cfg in self._bundles.values():
            total += sum(
                int(_np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree.leaves(variables)
            )
        return total

    def _fits(self, fn, variables, sample_args, budget=None):
        """(fits, compiled) from XLA's memory_analysis, without executing (an
        actual OOM on a relay chip kills the client). Sizes are per device.
        The compiled executable is returned so the probe's compile work is
        reused for the real run instead of repeating it through jit."""
        try:
            compiled = fn.lower(variables, *sample_args).compile()
        except Exception as e:
            # the TPU compiler enforces the HBM limit at compile time — a
            # failed compile at this block size means it does not fit (any
            # non-memory compile error will surface on the smallest block)
            log.info('compile at this block size failed (%s)',
                     str(e).splitlines()[0][:120])
            return False, None
        try:
            m = compiled.memory_analysis()
            need = (m.temp_size_in_bytes + m.argument_size_in_bytes
                    + m.output_size_in_bytes)
        except Exception:  # pragma: no cover - analysis unsupported (CPU)
            return True, compiled
        return need <= (budget if budget is not None else self.HBM_BUDGET), compiled

    def _forward_fn(self, model_dir_name: str, out_h: int, out_w: int,
                    device_preprocess: bool = False):
        cache_key = (model_dir_name, out_h, out_w, device_preprocess,
                     self.output_resize)
        if cache_key in self._fns:
            return self._fns[cache_key]
        model, variables, model_cfg = self._bundle(model_dir_name)
        data_shard = batch_sharding(self.mesh)
        repl = replicated_sharding(self.mesh)
        input_size = model_cfg['input_size']

        # octseg-trained manifests declare normalize=true (inference matches
        # training); absent key = reference predict() parity — raw BGR 0..255
        # floats with no mean/std (src/models/smp/model.py:183-200 quirk).
        normalize = bool(model_cfg.get('normalize', False))

        int8_mode = self.int8
        output_resize = self.output_resize

        def forward(variables, imgs):
            if device_preprocess:
                # fused on-device preprocessing: uint8 RGB frames at native
                # resolution → BGR float → bilinear resize to the model size
                # (replaces the per-frame host cv2 path, SURVEY §3.1).
                # Grayscale pullbacks arrive single-channel (3x less relay
                # upload, segment_pullback) and broadcast after the resize;
                # the BGR swap is an identity on one channel.
                imgs = imgs[..., ::-1].astype(jnp.float32)
                imgs = resize_bilinear(imgs, (input_size, input_size))
                if imgs.shape[-1] == 1:
                    imgs = jnp.broadcast_to(imgs, (*imgs.shape[:-1], 3))
            if normalize:
                imgs = normalize_imagenet(imgs)
            if int8_mode:
                from octseg.ops.quantize import apply_int8

                logits = apply_int8(model, variables, imgs, train=False)
            else:
                logits = model.apply(variables, imgs, train=False)
            if output_resize == 'prob_bilinear':
                probs = jax.nn.sigmoid(logits.astype(jnp.float32))
                probs = resize_bilinear(probs, (out_h, out_w))
                masks = (probs > 0.5).astype(jnp.float32)
            else:
                masks = sigmoid_threshold(logits)
                masks = resize_nearest(masks, (out_h, out_w))
            # binary masks travel host-ward bitpacked, 8 pixels/byte — the
            # mask download dominates pullback e2e on a relay-attached chip
            # (octseg/ops/bitpack.py); callers unpack with one numpy call
            return pack_mask_bits(masks.astype(jnp.uint8))

        fn = jax.jit(forward, in_shardings=(repl, data_shard), out_shardings=data_shard)
        variables = jax.device_put(variables, repl)
        self._bundles[model_dir_name] = (model, variables, model_cfg)
        self._fns[cache_key] = (fn, variables, model_cfg)
        return fn, variables, model_cfg

    def _block_for(self, model_dir_name: str, fn, variables, frame_shape,
                   dtype, extra_resident: int = 0, fn_key: tuple = (),
                   consult_aot: bool = True):
        """(block, runner): the largest block size (engine block halved until
        it fits, ≥ mesh size) whose compiled program fits HBM — decided from
        XLA's memory analysis, never by trial execution (896-px models OOM a
        16 GB chip at the 512-px block size). runner is the probe's compiled
        executable, reused so sizing costs no extra compilation."""
        # resident buffers shrink the per-execution budget: the uploaded
        # pullback plus every loaded model's replicated params (this model's
        # are also inside the probed argument sizes — counting them twice
        # errs on the safe side)
        budget = self.HBM_BUDGET - self._resident_bytes() - extra_resident
        # the budget is part of the key: a block sized while only one model
        # was resident may not fit once all three are — quantized to 256 MB
        # so float jitter can't fragment the cache. fn_key distinguishes
        # forward variants (output size, device preprocess) that share a
        # frame shape: a runner compiled for one output size must never be
        # reused for another (it would execute fine and return wrong-shape
        # masks).
        key = (model_dir_name, fn_key, tuple(frame_shape[1:]), str(dtype),
               int(budget) // (256 * 2 ** 20))
        # consult_aot=False (export path) must not read the cache either: a
        # cached entry may itself be an earlier AOT hit with no
        # memory_analysis; its probe result below refreshes the cache
        if consult_aot and key in self._blocks:
            return self._blocks[key]
        # AOT-exported program (octseg/infer/aot.py): skip tracing/lowering
        # entirely when a matching export exists and fits the current budget
        # (export_aot itself passes consult_aot=False so re-exporting never
        # recycles a loaded artifact as its `compiled` — that would lose the
        # memory_need metadata and the executable flavor)
        if consult_aot:
            from octseg.infer import aot as _aot

            model_cfg = self._bundle(model_dir_name)[2]
            aot_key = _aot.make_key(
                model_cfg, fn_key, frame_shape, dtype, 0,
                tuple(self.mesh.devices.shape), self.compute_dtype,
                self.int8)
            hit = _aot.load_runner(
                os.path.join(self.models_dir, model_dir_name), aot_key,
                budget=int(budget),
                # chunked slicing needs per-model blocks dividing the
                # engine block — rejected from the meta JSON, before the
                # artifact is deserialized/device-loaded
                block_divides=self.block_size)
            if hit is not None:
                self._blocks[key] = hit
                return hit
        bs = self.block_size
        runner = None
        while True:
            sample = jax.ShapeDtypeStruct((bs, *frame_shape[1:]), dtype)
            ok, runner = self._fits(fn, variables, (sample,), budget)
            if ok:
                break
            if bs <= self.n_devices:
                if runner is None:
                    # compile itself failed at the smallest block: break so
                    # the jit fallback in _run surfaces the real error (it
                    # may be a non-memory compile problem)
                    break
                # compiled but over budget: executing a program
                # memory_analysis rejected would OOM the chip (and kill a
                # relay client) — refuse instead
                raise RuntimeError(
                    f'{model_dir_name}: does not fit the HBM budget '
                    f'({budget / 2 ** 30:.1f} GiB free of '
                    f'{self.HBM_BUDGET / 2 ** 30:.1f}) even at the minimum '
                    f'block size {bs}; unload other models or shrink the '
                    f'resident pullback')
            log.info('%s: block %d exceeds the HBM budget — halving',
                     model_dir_name, bs)
            bs //= 2
            runner = None
        self._blocks[key] = (bs, runner)
        return bs, runner

    def _slicer(self, block: int):
        """Jitted frame-axis slicer with a pinned output sharding, cached per
        block size so repeated pullbacks reuse the compiled program instead
        of re-tracing (compiles cost seconds on a relay-attached chip)."""
        if block not in self._slicers:
            self._slicers[block] = jax.jit(
                functools.partial(
                    jax.lax.dynamic_slice_in_dim, slice_size=block, axis=0),
                out_shardings=batch_sharding(self.mesh),
            )
        return self._slicers[block]

    def export_aot(self, model_dir_name: str, output_size: Sequence[int],
                   frame_hw: Optional[Sequence[int]] = None) -> list:
        """Export this model's forward program(s) as AOT serving artifacts
        (octseg/infer/aot.py). ``frame_hw`` set → the device-preprocess
        pullback variant at that native frame size; unset → the PIL/images
        variant at the model's input size. Returns the written paths."""
        from octseg.infer import aot as _aot

        out_h, out_w = int(output_size[0]), int(output_size[1])
        model_path = os.path.join(self.models_dir, model_dir_name)
        written = []
        if frame_hw is not None:
            # both pullback variants: RGB and the mono fast path (grayscale
            # pullbacks upload one channel, segment_pullback)
            variants = [((int(frame_hw[0]), int(frame_hw[1]), 3),
                         jnp.uint8, True),
                        ((int(frame_hw[0]), int(frame_hw[1]), 1),
                         jnp.uint8, True)]
        else:
            input_size = self._bundle(model_dir_name)[2]['input_size']
            variants = [((input_size, input_size, 3), jnp.float32, False)]
        for shape_tail, dtype, device_preprocess in variants:
            fn, variables, model_cfg = self._forward_fn(
                model_dir_name, out_h, out_w,
                device_preprocess=device_preprocess)
            fn_key = (out_h, out_w, device_preprocess, self.output_resize)
            frame_shape = (self.block_size, *shape_tail)
            bs, runner = self._block_for(
                model_dir_name, fn, variables, frame_shape, dtype,
                fn_key=fn_key, consult_aot=False)
            need = None
            if runner is not None and hasattr(runner, 'memory_analysis'):
                try:
                    m = runner.memory_analysis()
                    need = int(m.temp_size_in_bytes + m.argument_size_in_bytes
                               + m.output_size_in_bytes)
                except Exception:
                    need = None
            key = _aot.make_key(
                model_cfg, fn_key, frame_shape, dtype, bs,
                tuple(self.mesh.devices.shape), self.compute_dtype, self.int8)
            written.append(_aot.save_exported(
                model_path, key, fn, variables, (bs, *shape_tail), dtype,
                need, compiled=runner))
        return written

    @staticmethod
    def _run(runner, fn, variables, chunk):
        if runner is not None:
            try:
                return runner(variables, chunk)
            except Exception as e:
                # The probe executable committed input layouts/shardings at
                # lower() time; a mismatch must fall back to jit. The exact
                # exception type/wording is jaxlib-version-dependent, so the
                # fallback is broad BUT loud — and nothing is masked: a
                # genuine runtime failure (bad input, device fault)
                # reproduces on the jit path below and raises from there.
                log.warning('compiled runner rejected the input (%s) — '
                            'falling back to jit', str(e).splitlines()[0][:160])
        return fn(variables, chunk)

    def run_model(
        self, model_dir_name: str, images: List[Image.Image], output_size: Sequence[int]
    ) -> np.ndarray:
        """All frames through one model; returns (N, out_h, out_w, C) uint8
        {0,1} masks (binary masks travel host-ward bitpacked, 8 pixels/byte
        — 32x less relay transfer than float32)."""
        out_h, out_w = int(output_size[0]), int(output_size[1])
        fn, variables, model_cfg = self._forward_fn(model_dir_name, out_h, out_w)
        input_size = model_cfg['input_size']
        n = len(images)
        outs = []
        bs, runner = self._block_for(
            model_dir_name, fn, variables,
            (self.block_size, input_size, input_size, 3), jnp.float32,
            fn_key=(out_h, out_w, False, self.output_resize),
        )
        data_shard = batch_sharding(self.mesh)
        for start in range(0, n, bs):
            # preprocess per block: one whole-pullback float32 stack would
            # transiently hold N*input_size^2*12 bytes on the host (1.6 GB
            # for a 500-frame pullback at 512 px)
            chunk = np.stack(
                [preprocessing_img(img.copy(), input_size)
                 for img in images[start:start + bs]]
            ).astype(np.float32)
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            out = self._run(
                runner, fn, variables,
                jax.device_put(jnp.asarray(chunk), data_shard),
            )
            outs.append(unpack_mask_bits(np.asarray(out), out_w)[: bs - pad])
        return np.concatenate(outs, axis=0)

    @staticmethod
    def _as_mono_if_gray(frames: np.ndarray) -> np.ndarray:
        """Grayscale-replicated pullbacks (common for raw, non-colormapped
        OCT) drop to one channel — 3x less relay upload; the forward program
        broadcasts after the on-device resize. A strided sample rejects
        color pullbacks before the exact full scan pays a memory pass."""
        if frames.shape[-1] != 3:
            return frames
        s = frames[:: max(1, frames.shape[0] // 16), ::37, ::41]
        if ((s[..., 0] == s[..., 1]).all()
                and (s[..., 1] == s[..., 2]).all()
                and (frames[..., 0] == frames[..., 1]).all()
                and (frames[..., 1] == frames[..., 2]).all()):
            return np.ascontiguousarray(frames[..., :1])
        return frames

    def _ensemble_plan(self):
        """{model_dir: [(class, model channel, mask channel), ...]} in
        routing order (MODELS_META, reference src/predict.py:23-28)."""
        from octseg.core.registry import CLASS_IDS

        plan: Dict[str, list] = {}
        for class_name in self.classes:
            meta = MODELS_META[class_name]
            plan.setdefault(meta['model_dir'], []).append(
                (class_name, meta['index'], CLASS_IDS[class_name] - 1))
        return plan

    def iter_pullback(self, frames: np.ndarray, output_size: Sequence[int]):
        """Streaming pullback inference: yields ``(start, masks_block)`` —
        masks_block is (<=block_size, out_h, out_w, 4) float32 {0,1} — one
        engine block at a time, in frame order.

        The serving shape of :meth:`segment_pullback`: host memory is
        bounded by two frame blocks plus two mask blocks regardless of
        pullback length (segment_pullback holds the whole pullback and an
        (N, out², 4) float32 result), and the loop is pipelined one block
        deep — block k+1's upload AND all of its model executions are
        dispatched before block k's results are fetched, so the relay
        download and the host bit-expansion of block k overlap block k+1's
        device compute (draining before dispatching made streaming 2.2x
        slower than the batch path, benchmarks/e2e_pullback.json r4). All
        three models run per block, so their executables' temp buffers
        still never coexist (serial dispatch), while only O(block) frames
        are device-resident."""
        out_h, out_w = int(output_size[0]), int(output_size[1])
        n = int(frames.shape[0])
        if n == 0:
            return
        if not isinstance(frames, np.ndarray):
            # np.asarray on a device array would silently DOWNLOAD the whole
            # pullback through the relay before re-uploading it block-wise
            raise TypeError(
                'iter_pullback streams host-resident pullbacks; for a '
                'device-resident array use segment_pullback')
        plan = self._ensemble_plan()
        frames = self._as_mono_if_gray(frames)
        data_shard = batch_sharding(self.mesh)
        eb = self.block_size
        # per-model programs sized against a budget holding at most two
        # uploaded blocks (current + prefetched) plus the previous block's
        # not-yet-fetched bitpacked outputs, per-device share
        block_bytes = (eb * int(np.prod(frames.shape[1:]))
                       * frames.dtype.itemsize // self.n_devices)
        out_bytes = eb * out_h * ((out_w + 7) // 8) * 4 // self.n_devices
        runs = {}
        for model_dir_name in plan:
            fn, variables, _cfg = self._forward_fn(
                model_dir_name, out_h, out_w, device_preprocess=True)
            bs, runner = self._block_for(
                model_dir_name, fn, variables, (eb, *frames.shape[1:]),
                frames.dtype, extra_resident=2 * (block_bytes + out_bytes),
                fn_key=(out_h, out_w, True, self.output_resize))
            runs[model_dir_name] = (fn, variables, bs, runner)

        def upload(start):
            chunk = frames[start:start + eb]
            pad = eb - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            # async dispatch: the host returns before the relay transfer
            # completes, so the next block streams in during compute
            return jax.device_put(jnp.asarray(chunk), data_shard)

        def dispatch(cur):
            # enqueue every model's executions; nothing is fetched here
            pending = {}
            for model_dir_name, (fn, variables, bs, runner) in runs.items():
                slicer = self._slicer(bs)
                pending[model_dir_name] = [
                    self._run(runner, fn, variables, slicer(cur, s))
                    for s in range(0, eb, bs)]
            return pending

        nxt = upload(0)
        pending = None
        for start in range(0, n, eb):
            cur, nxt = nxt, (upload(start + eb) if start + eb < n else None)
            cur_pending, pending = pending, None
            if cur_pending is None:
                cur_pending = dispatch(cur)
            # pipeline depth 1: next block's compute is on the device queue
            # BEFORE this block's results are fetched/expanded on the host
            if nxt is not None:
                pending = dispatch(nxt)
            take = min(eb, n - start)
            block_masks = np.zeros((take, out_h, out_w, 4), np.float32)
            for model_dir_name, classes in plan.items():
                self._drain(cur_pending[model_dir_name],
                            runs[model_dir_name][2], take, classes,
                            block_masks)
            yield start, block_masks

    def segment_pullback(
        self, frames: np.ndarray, output_size: Sequence[int]
    ) -> np.ndarray:
        """Fast path for whole pullbacks: (N, H, W, 3) uint8 RGB frames →
        (N, out_h, out_w, 4) float32 {0,1} ensemble masks. All per-pixel work
        (BGR swap, resize, forward, threshold, output resize) happens on
        device in static frame blocks; the host only uploads raw frames —
        one channel when the pullback is grayscale-replicated — and
        downloads bitpacked masks (8 pixels/byte). (N, H, W, 1) input takes
        the mono path directly."""
        out_h, out_w = int(output_size[0]), int(output_size[1])
        n = frames.shape[0]
        result = np.zeros((n, out_h, out_w, 4), np.float32)
        plan = self._ensemble_plan()
        data_shard = batch_sharding(self.mesh)
        # pad once to the engine block (every per-model block divides it),
        # upload once, share across all models
        pad_total = (-n) % self.block_size
        if isinstance(frames, np.ndarray):
            frames = self._as_mono_if_gray(frames)
            if pad_total:
                frames = np.concatenate(
                    [frames, np.zeros((pad_total, *frames.shape[1:]), frames.dtype)]
                )
            frames = jax.device_put(jnp.asarray(frames), data_shard)
        elif pad_total:
            frames = jnp.pad(frames, ((0, pad_total), (0, 0), (0, 0), (0, 0)))

        for model_dir_name, class_routes in plan.items():
            fn, variables, _cfg = self._forward_fn(
                model_dir_name, out_h, out_w, device_preprocess=True
            )
            bs, runner = self._block_for(
                model_dir_name, fn, variables,
                (self.block_size, *frames.shape[1:]), frames.dtype,
                # the pullback is batch-sharded: per-device share only
                extra_resident=int(frames.size) * frames.dtype.itemsize
                // self.n_devices,
                fn_key=(out_h, out_w, True, self.output_resize),
            )
            # slice on device under jit with an explicit output sharding: an
            # eager dynamic_slice of a 'data'-sharded array yields an
            # unspecified-sharding result the compiled runner would reject
            # (surfaced by the multichip dryrun at block < pullback size)
            slicer = self._slicer(bs)
            outs = [
                self._run(runner, fn, variables, slicer(frames, start))
                for start in range(0, n + pad_total, bs)
            ]
            # fetch -> unpack -> write each block straight into the result:
            # no whole-pullback intermediate (a concat would copy 2 GB for a
            # 500-frame pullback), and a 1-thread prefetch keeps the next
            # block's relay download in flight while this one unpacks
            self._drain(outs, bs, n, class_routes, result)
        return result

    @staticmethod
    def _drain(outs, bs: int, n: int, class_routes,
               result: np.ndarray, offset: int = 0) -> None:
        """Fetch each dispatched block and expand its bits straight into the
        routed channels of ``result[offset + k*bs : ...]`` (one native pass,
        octseg/ops/bitpack.py unpack_route_into); the next block's
        device→host transfer overlaps the current block's host work."""
        from concurrent.futures import ThreadPoolExecutor

        routes = [(ch, mask_ch) for _class_name, ch, mask_ch in class_routes]
        with ThreadPoolExecutor(1) as pool:
            fut = pool.submit(np.asarray, outs[0])
            for k in range(len(outs)):
                arr = fut.result()
                if k + 1 < len(outs):
                    fut = pool.submit(np.asarray, outs[k + 1])
                lo = offset + k * bs
                if lo >= offset + n:
                    break
                hi = min(lo + bs, offset + n)
                unpack_route_into(arr[: hi - lo], result[lo:hi], routes)

    def segment(
        self,
        images: List[Image.Image],
        masks: List[np.ndarray],
        output_size: Sequence[int],
    ) -> List[np.ndarray]:
        """Fill the (H, W, 4) masks for the selected classes (ref segment()
        semantics, src/predict.py:61-101) — but each underlying model runs
        exactly once even when it serves two classes (FC_LC)."""

        for model_dir_name, class_routes in self._ensemble_plan().items():
            pred = self.run_model(model_dir_name, images, output_size)
            for _class_name, ch, mask_ch in class_routes:
                channel = pred[:, :, :, ch] if pred.ndim == 4 else pred
                for i, mask in enumerate(masks):
                    mask[:, :, mask_ch] = channel[i]
        return masks
