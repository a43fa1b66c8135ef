"""Training entry point: pjit data-parallel epoch loop with on-device augment.

Framework equivalent of the reference trainer (reference:
src/models/smp/train.py + the LightningModule loop in model.py:73-148), built
TPU-first:
- one jitted train step: device augmentation → normalize → forward/backward →
  optimizer update, with the batch axis sharded over the ICI mesh and params
  replicated (XLA inserts the gradient psums);
- host side only decodes/resizes and prefetches (octseg.train.data);
- metrics.csv keeps the exact reference schema; weights.ckpt + config.json
  keep the reference model-dir contract; resume.ckpt adds crash recovery.

Config: configs/train.yaml (same keys as the reference train.yaml).
Usage: python -m octseg.train.train [key=value ...]
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from octseg.core.config import Config, entry_point
from octseg.core.logging_utils import ScalarLogger
from octseg.models import create_model
from octseg.ops.augment import augment_batch
from octseg.ops.normalize import normalize_imagenet, sigmoid_threshold
from octseg.parallel.sharding import batch_sharding, make_mesh, replicate, replicated_sharding
from octseg.train import checkpoint as ckpt
from octseg.train.data import OCTDataset, PrefetchLoader
from octseg.train.losses import dice_loss_from_logits
from octseg.train.metrics import compute_metrics, save_metrics_on_epoch
from octseg.train.state import TrainState, make_optimizer

log = logging.getLogger(__name__)


def _loss_and_metrics(model, params, batch_stats, imgs, masks, train: bool,
                      dropout_key=None, remat: bool = False, valid=None):
    # remat (activation checkpointing) is PER-BLOCK, enabled model-wide via
    # octseg.models.rematutil (train_model sets it from cfg.remat): a
    # whole-apply jax.checkpoint saves nothing at peak — the backward
    # recomputes the entire forward and holds every activation at once
    # (measured identical peak, r2). The parameter is kept for API clarity.
    del remat
    x = normalize_imagenet(imgs)
    variables = {'params': params, 'batch_stats': batch_stats}
    if train:
        logits, mutated = model.apply(
            variables, x, train=True, mutable=['batch_stats'],
            rngs={'dropout': dropout_key},
        )
        new_stats = mutated['batch_stats']
    else:
        logits = model.apply(variables, x, train=False)
        new_stats = batch_stats
    loss = dice_loss_from_logits(logits, masks, valid=valid)
    return loss, (logits, new_stats)


def make_train_step(model, use_augmentation: bool, remat: bool = False,
                    mesh=None):
    """mesh (optional): lets the augmentation's Pallas warp shard_map over the
    batch axis when the step itself is pjit-sharded over >1 devices."""
    def train_step(state: TrainState, imgs, masks, key):
        aug_key, dropout_key = jax.random.split(key)
        if use_augmentation:
            imgs, masks = augment_batch(imgs, masks, aug_key, mesh=mesh)

        grad_fn = jax.value_and_grad(
            lambda p: _loss_and_metrics(
                model, p, state.batch_stats, imgs, masks, True, dropout_key,
                remat=remat,
            ),
            has_aux=True,
        )
        (loss, (logits, new_stats)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads, new_stats)
        pred = sigmoid_threshold(logits)
        metrics = compute_metrics(pred, masks, loss)
        return state, metrics

    return train_step


def make_eval_step(model):
    def eval_step(state: TrainState, imgs, masks, valid):
        # valid masks out mesh-padding samples: the scalar loss then equals
        # the unpadded batch's loss (per-sample metric rows are sliced back
        # on the host)
        loss, (logits, _) = _loss_and_metrics(
            model, state.params, state.batch_stats, imgs, masks, False,
            valid=valid,
        )
        pred = sigmoid_threshold(logits)
        return compute_metrics(pred, masks, loss)

    return eval_step


def dump_epoch_examples(cfg, model, state, model_dir, classes, epoch) -> None:
    """Per-epoch qualitative tri-panel dumps (img | GT colors | pred colors)
    from {data_dir}/vis/img, the reference's log_predict_model_on_epoch
    (src/models/smp/model.py:208-248)."""
    import cv2
    from glob import glob as _glob

    from octseg.core.registry import CLASS_COLORS_BGR, CLASS_IDS
    from octseg.data.tiffio import read_tiff

    vis_dir = os.path.join(cfg.data_dir, 'vis', 'img')
    if not os.path.isdir(vis_dir):
        return
    out_dir = os.path.join(model_dir, 'images_per_epoch')
    os.makedirs(out_dir, exist_ok=True)
    size = int(cfg.input_size)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    for img_path in _glob(os.path.join(vis_dir, '*.[pj][np]g')):
        img = cv2.resize(cv2.imread(img_path), (size, size))
        mask_path = os.path.splitext(img_path.replace('/img/', '/mask/'))[0] + '.tiff'
        if not os.path.exists(mask_path):
            continue
        gt = cv2.resize(read_tiff(mask_path), (size, size),
                        interpolation=cv2.INTER_NEAREST)
        if gt.ndim == 2:
            gt = gt[:, :, None]
        # normalize exactly like the train/eval steps (the reference dumps
        # through predict(), which SKIPS its mean/std — a quirk of the torch
        # model, model.py:183-200; octseg-trained manifests say
        # normalize: true, so the dump must match this model's own contract)
        x = normalize_imagenet(jnp.asarray(img[None], jnp.float32))
        logits = model.apply(variables, x, train=False)
        pred = np.asarray(logits[0]) > 0
        panel_gt = np.full_like(img, 128)
        panel_pred = np.full_like(img, 128)
        for idy, cl in enumerate(classes):
            cid = CLASS_IDS[cl] - 1
            panel_gt[gt[:, :, cid] == 255] = CLASS_COLORS_BGR[cl]
            panel_pred[pred[:, :, idy]] = CLASS_COLORS_BGR[cl]
        res = np.hstack([img, panel_gt, panel_pred])
        stem = os.path.splitext(os.path.basename(img_path))[0]
        cv2.imwrite(os.path.join(out_dir, f'{stem}_epoch_{epoch:03d}.png'), res)


def pick_mesh_size(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides the batch size."""
    for n in range(min(batch_size, n_devices), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def train_model(
    cfg: Config,
    model_dir: Optional[str] = None,
    on_epoch_end=None,
    devices=None,
) -> dict:
    """Run one training; returns summary dict (best metrics). Reusable by the
    tuner and the 5-fold driver.

    on_epoch_end(epoch, val_summary: dict) -> bool — optional callback; return
    True to stop early (the tuner's HyperBand hook).
    devices — optional explicit device list (a submesh); the concurrent tuner
    passes disjoint groups so k trials train simultaneously.
    """
    classes = list(cfg.classes)
    model_name = cfg.get('model_name') or f"{cfg.architecture}_{cfg.encoder}"
    model_dir = model_dir or os.path.join(cfg.get('save_dir', 'models'), model_name)
    os.makedirs(model_dir, exist_ok=True)
    ckpt.save_manifest(model_dir, cfg, model_name)

    train_set = OCTDataset(
        os.path.join(cfg.data_dir, 'train'), classes, cfg.input_size
    )
    val_set = OCTDataset(os.path.join(cfg.data_dir, 'test'), classes, cfg.input_size)

    device_pool = list(devices) if devices is not None else jax.devices()
    n_mesh = pick_mesh_size(cfg.batch_size, len(device_pool))
    mesh = make_mesh(devices=device_pool[:n_mesh])
    log.info('Training on a %d-device mesh (%s)', n_mesh, device_pool[0].platform)
    data_shard = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    from octseg.models.rematutil import set_block_remat

    # per-block activation rematerialization (process-global, trace-time)
    set_block_remat(bool(cfg.get('remat', False)))
    # bf16 compute (params stay fp32, logits/loss fp32) — TPU-native mixed
    # precision, opt-in to keep exact reference parity by default
    compute_dtype = jnp.bfloat16 if cfg.get('bf16', False) else jnp.float32
    model = create_model(
        cfg.architecture, cfg.encoder, in_channels=3, classes=len(classes),
        dtype=compute_dtype,
    )
    rng = jax.random.PRNGKey(cfg.get('seed', 11))
    init_rng, loop_rng = jax.random.split(rng)
    # Jit the init as ONE program at a reduced spatial size: eager init
    # dispatches hundreds of tiny ops, each paying a full round trip on a
    # relay-attached device (~30 min for efficientnet-b7 — measured r5), and
    # param/batch_stats shapes are spatial-size-independent for every arch in
    # the zoo (same contract as checkpoint.initialize_model_dir's init_size).
    init_size = min(int(cfg.input_size), 128)
    sample = jnp.zeros((1, init_size, init_size, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {'params': init_rng, 'dropout': init_rng}, sample
    )
    # Pretrained encoder start (the reference's encoder_weights='imagenet',
    # src/models/smp/model.py:38-44). No download path exists on air-gapped
    # rigs, so the value is a local torch state-dict/ckpt file; it converts
    # weight-for-weight via octseg.models.convert_torch.
    enc_weights = cfg.get('encoder_weights')
    if enc_weights and str(enc_weights).lower() not in ('none', 'null', ''):
        from octseg.models.convert_torch import load_pretrained_encoder

        variables = load_pretrained_encoder(variables, str(enc_weights), cfg.encoder)
        log.info('Initialized encoder from %s', enc_weights)
    # Whole-model warm start from an octseg weights.ckpt (params+batch_stats;
    # optimizer state starts fresh). Conv/BN shapes are input-size-independent,
    # so a donor trained at a smaller input_size loads directly — this is the
    # progressive-resizing pretrain the flagship real-imagery experiment uses
    # (the Flax-donor analog of encoder_weights=, which takes torch donors).
    init_w = cfg.get('init_weights')
    if init_w and str(init_w).lower() not in ('none', 'null', ''):
        variables = ckpt.restore_weights_into(variables, str(init_w))
        log.info('Warm-started params+batch_stats from %s', init_w)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.get('weight_decay', 0.0))
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    state = replicate(state, mesh)

    train_step = jax.jit(
        make_train_step(
            model,
            bool(cfg.get('use_augmentation', False)),
            remat=bool(cfg.get('remat', False)),
            mesh=mesh,
        ),
        in_shardings=(None, data_shard, data_shard, repl),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        make_eval_step(model),
        in_shardings=(None, data_shard, data_shard, data_shard),
    )

    use_native = cfg.get('native_loader', 'auto')
    if use_native in (True, 'auto'):
        from octseg.train.native_loader import NativeLoader, native_available

        if native_available():
            train_loader = NativeLoader(
                train_set, cfg.batch_size, shuffle=True, seed=cfg.get('seed', 11)
            )
            log.info('Using native (C++) data loader')
        elif use_native is True:
            raise RuntimeError('native_loader=true but the native loader is unavailable')
        else:
            train_loader = None
    else:
        train_loader = None
    if train_loader is None:
        train_loader = PrefetchLoader(
            train_set, cfg.batch_size, shuffle=True, drop_last=True,
            seed=cfg.get('seed', 11),
        )
    val_loader = PrefetchLoader(val_set, cfg.batch_size, shuffle=False, drop_last=False)
    if len(train_loader) == 0:
        raise ValueError(
            f'train split has {len(train_set)} samples — smaller than '
            f'batch_size {cfg.batch_size} (drop_last): nothing to train on')

    start_epoch = 1
    best = {'val_loss': float('inf')}
    best_metrics: dict = {}
    summary: dict = {}
    resume_path = os.path.join(model_dir, 'resume.ckpt')
    if cfg.get('resume', False) and os.path.exists(resume_path):
        state, last_epoch, extra = ckpt.load_resume(resume_path, state)
        state = replicate(state, mesh)
        start_epoch = last_epoch + 1
        best['val_loss'] = extra.get('best_val_loss', float('inf'))
        best_metrics = dict(extra.get('best_metrics', {}))
        # the shuffle sequence continues where the crashed run stopped (the
        # loaders draw permutation rng(seed + epoch) per __iter__)
        train_loader.epoch = last_epoch
        # an already-finished run must still return a usable summary
        summary = {
            'best_val_loss': best['val_loss'],
            'last_val_f1': float(extra.get('last_val_f1', 0.0)),
            'best_metrics': best_metrics,
            'epochs_done': last_epoch,
        }
        log.info('Resumed from %s at epoch %d', resume_path, last_epoch)

    scalar_logger = ScalarLogger(model_dir)
    for epoch in range(start_epoch, int(cfg.epochs) + 1):
        t0 = time.time()
        # Metrics stay ON DEVICE all epoch and are fetched once, stacked:
        # a per-step host fetch costs a full relay/PCIe round trip AND blocks
        # the dispatch pipeline (the host can't enqueue step N+1 until it has
        # read step N) — on a tunneled chip that dominated the epoch (r2:
        # 200 s/epoch of syncs vs ~15 s of compute).
        device_metrics = []
        # Relay-debug knob: host-fetch each step's loss so per-step progress
        # is visible on a tunneled device (a stalled remote execution is
        # otherwise indistinguishable from a long async epoch). Costs one
        # ~30 ms round trip per step and serializes the dispatch pipeline —
        # diagnostics only, never the default.
        step_sync = bool(os.environ.get('OCTSEG_STEP_SYNC'))
        for step, (imgs, masks) in enumerate(train_loader):
            key = jax.random.fold_in(loop_rng, epoch * 100003 + step)
            imgs = jax.device_put(imgs, data_shard)
            masks = jax.device_put(masks, data_shard)
            state, metrics = train_step(state, imgs, masks, key)
            device_metrics.append(metrics)
            if step_sync:
                log.info('epoch %d step %d loss=%.4f (%.1fs)', epoch, step,
                         float(jax.device_get(metrics['loss'])),
                         time.time() - t0)
        stacked = jax.device_get(
            jax.tree.map(lambda *xs: jnp.stack(xs), *device_metrics)
        )
        if cfg.get('check_finite', True) and not np.all(np.isfinite(stacked['loss'])):
            bad = int(np.argmax(~np.isfinite(stacked['loss'])))
            raise FloatingPointError(f'Non-finite loss at epoch {epoch} step {bad}')
        train_metrics = [
            jax.tree.map(lambda a, i=i: a[i], stacked)
            for i in range(len(device_metrics))
        ]
        save_metrics_on_epoch(
            train_metrics, 'train', model_dir, classes, epoch, logger=scalar_logger
        )

        val_device = []
        for imgs, masks in val_loader:
            n = imgs.shape[0]
            pad = (-n) % n_mesh
            if pad:  # pad partial batches to the mesh, then drop the padding
                # wrap the indices: the last batch can be SMALLER than the
                # pad amount (n=1 on a 4-mesh needs 3 pad rows)
                idx = np.arange(pad) % n
                imgs = np.concatenate([imgs, imgs[idx]], axis=0)
                masks = np.concatenate([masks, masks[idx]], axis=0)
            valid = np.ones(imgs.shape[0], np.float32)
            if pad:
                valid[n:] = 0.0
            m = eval_step(
                state,
                jax.device_put(imgs, data_shard),
                jax.device_put(masks, data_shard),
                jax.device_put(valid, data_shard),
            )
            val_device.append((m, n, pad))
        val_metrics = []
        for m, n, pad in val_device:  # fetch after the whole split is enqueued
            m = jax.device_get(m)
            if pad:
                m = {k: (v if v.ndim == 0 else v[:n]) for k, v in m.items()}
            val_metrics.append(m)
        best_metrics = save_metrics_on_epoch(
            val_metrics, 'test', model_dir, classes, epoch, best_metrics,
            logger=scalar_logger,
        )
        interval = cfg.get('img_save_interval')
        if interval and epoch % int(interval) == 0:
            dump_epoch_examples(cfg, model, state, model_dir, classes, epoch)

        val_loss = float(np.mean([np.asarray(m['loss']) for m in val_metrics]))
        val_f1 = float(
            np.mean([np.asarray(m['f1']).mean() for m in val_metrics])
        )
        log.info(
            'epoch %d  val/loss %.4f  val/f1 %.4f  (%.1f s)',
            epoch, val_loss, val_f1, time.time() - t0,
        )
        if val_loss < best['val_loss']:  # ModelCheckpoint(val/loss, min) parity
            best['val_loss'] = val_loss
            ckpt.save_weights(
                os.path.join(model_dir, 'weights.ckpt'), state.params, state.batch_stats
            )
        # resume_interval > 1 amortizes the full-state fetch (params + opt
        # moments) — on a relay-tunneled chip that fetch dominates short
        # epochs; crash recovery then loses at most interval-1 epochs
        interval = max(1, int(cfg.get('resume_interval', 1)))
        if epoch % interval == 0 or epoch == int(cfg.epochs):
            ckpt.save_resume(resume_path, state, epoch,
                             {'best_val_loss': best['val_loss'],
                              'best_metrics': best_metrics,
                              'last_val_f1': val_f1})
        summary = {
            'best_val_loss': best['val_loss'],
            'last_val_f1': val_f1,
            'best_metrics': best_metrics,
            'epochs_done': epoch,
        }
        if on_epoch_end is not None and on_epoch_end(epoch, summary):
            log.info('Early termination requested at epoch %d', epoch)
            break
    return summary


@entry_point('train')
def main(cfg: Config) -> None:
    t = time.strftime('%d%m_%H%M')
    model_name = f'{cfg.architecture}_{cfg.encoder}_{t}'  # ref train.py:38
    cfg['model_name'] = model_name
    summary = train_model(cfg)
    log.info('Complete: %s', summary)


if __name__ == '__main__':
    main()
