import os

import numpy as np
import pytest

from octseg.core.config import Config
from octseg.data.io import imwrite, imwrite_mask_tiff


def make_fold(root, n_train=8, n_test=4, size=64, rng=None):
    rng = rng or np.random.default_rng(3)
    for split, n in (('train', n_train), ('test', n_test)):
        os.makedirs(f'{root}/{split}/img', exist_ok=True)
        os.makedirs(f'{root}/{split}/mask', exist_ok=True)
        for i in range(n):
            # bright disk = "lumen"
            img = rng.integers(0, 60, (size, size, 3), dtype=np.uint8)
            yy, xx = np.mgrid[:size, :size]
            cy, cx = rng.integers(size // 3, 2 * size // 3, 2)
            r = rng.integers(size // 8, size // 4)
            disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            img[disk] = [200, 180, 220]
            mask = np.zeros((size, size, 4), np.uint8)
            mask[:, :, 0] = disk.astype(np.uint8) * 255
            imwrite(f'{root}/{split}/img/{i:03d}.png', img)
            imwrite_mask_tiff(f'{root}/{split}/mask/{i:03d}.tiff', mask)
    return root


@pytest.fixture(scope='module')
def fold_dir(tmp_path_factory):
    return make_fold(str(tmp_path_factory.mktemp('fold')))


def test_dataset_and_loader(fold_dir):
    from octseg.train.data import OCTDataset, PrefetchLoader

    ds = OCTDataset(f'{fold_dir}/train', ['Lumen'], input_size=64)
    assert len(ds) == 8
    img, mask = ds.load(0)
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}

    loader = PrefetchLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 64, 64, 3)
    # reshuffles between epochs
    b2 = list(loader)
    assert not np.array_equal(batches[0][0], b2[0][0]) or not np.array_equal(
        batches[1][0], b2[1][0]
    )


def test_dice_loss_matches_reference_formula(rng):
    import jax.numpy as jnp

    from octseg.train.losses import dice_loss_from_logits

    logits = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    targets = (rng.random((2, 16, 16, 3)) > 0.5).astype(np.float32)
    # reference formula (smp DiceLoss multilabel from_logits), numpy
    probs = 1 / (1 + np.exp(-logits))
    inter = (probs * targets).sum(axis=(0, 1, 2))
    card = (probs + targets).sum(axis=(0, 1, 2))
    expected = (1 - 2 * inter / np.clip(card, 1e-7, None)).mean()
    got = float(dice_loss_from_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_metrics_formulas(rng):
    import jax.numpy as jnp

    from octseg.train.metrics import compute_metrics

    pred = (rng.random((4, 8, 8, 2)) > 0.5).astype(np.float32)
    target = (rng.random((4, 8, 8, 2)) > 0.5).astype(np.float32)
    m = compute_metrics(jnp.asarray(pred), jnp.asarray(target), jnp.float32(0.5))
    tp = (pred * target).sum(axis=(1, 2))
    fp = (pred * (1 - target)).sum(axis=(1, 2))
    fn = ((1 - pred) * target).sum(axis=(1, 2))
    iou = tp / (tp + fp + fn)
    np.testing.assert_allclose(np.asarray(m['iou']), iou, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m['dice']), 2 * iou / (iou + 1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m['f1']), 2 * tp / (2 * tp + fp + fn), rtol=1e-5
    )


def test_train_loop_end_to_end(fold_dir, tmp_path):
    """2-epoch training on the 8-device CPU mesh; checks the model-dir contract."""
    import pandas as pd

    from octseg.train.train import train_model

    cfg = Config(
        data_dir=fold_dir,
        classes=['Lumen'],
        architecture='Unet',
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        weight_decay=1e-4,
        input_size=64,
        batch_size=4,
        epochs=2,
        use_augmentation=True,
        save_dir=str(tmp_path / 'models'),
        model_name='test_model',
        seed=11,
    )
    summary = train_model(cfg)
    model_dir = tmp_path / 'models' / 'test_model'
    assert (model_dir / 'weights.ckpt').exists()
    assert (model_dir / 'config.json').exists()
    assert (model_dir / 'resume.ckpt').exists()
    df = pd.read_csv(model_dir / 'metrics.csv')
    assert list(df.columns) == [
        'Epoch', 'Loss', 'IoU', 'Dice', 'Precision', 'Recall', 'F1', 'Split', 'Class',
    ]
    assert set(df['Split']) == {'train', 'test'}
    assert set(df['Class']) == {'Lumen', 'Mean'}
    assert df['Epoch'].max() == 2
    assert summary['epochs_done'] == 2

    # resume: continue to epoch 3
    cfg['epochs'] = 3
    cfg['resume'] = True
    summary2 = train_model(cfg)
    assert summary2['epochs_done'] == 3
    df2 = pd.read_csv(model_dir / 'metrics.csv')
    assert df2['Epoch'].max() == 3
    # the resumed run kept the earlier best: best_val_loss can only improve
    assert summary2['best_val_loss'] <= summary['best_val_loss'] + 1e-9


def test_init_weights_warm_start_across_input_sizes(fold_dir, tmp_path):
    """cfg.init_weights loads a donor weights.ckpt trained at a DIFFERENT
    input size (conv/BN shapes are size-independent) — the progressive-
    resizing pretrain mechanism used by scripts/train_demo_realdata.py."""
    import jax

    from octseg.train.checkpoint import load_weights
    from octseg.train.train import train_model

    base = dict(
        data_dir=fold_dir, classes=['Lumen'], architecture='Unet',
        encoder='resnet18', optimizer='Adam', lr=1e-3, batch_size=4,
        use_augmentation=False, seed=11,
    )
    donor_dir = str(tmp_path / 'donor')
    train_model(Config(dict(base, input_size=32, epochs=1,
                            save_dir=str(tmp_path), model_name='donor')),
                model_dir=donor_dir)
    donor = load_weights(os.path.join(donor_dir, 'weights.ckpt'))

    warm_dir = str(tmp_path / 'warm')
    summary = train_model(
        Config(dict(base, input_size=64, epochs=1,
                    init_weights=os.path.join(donor_dir, 'weights.ckpt'),
                    save_dir=str(tmp_path), model_name='warm')),
        model_dir=warm_dir)
    assert summary['epochs_done'] == 1
    warm = load_weights(os.path.join(warm_dir, 'weights.ckpt'))
    # after one small-lr epoch the warm params must be far closer to the
    # donor than a fresh init would be
    d_leaves = jax.tree.leaves(donor['params'])
    w_leaves = jax.tree.leaves(warm['params'])
    rel = [
        float(np.abs(w - d).max() / (np.abs(d).max() + 1e-9))
        for w, d in zip(w_leaves, d_leaves)
    ]
    assert np.median(rel) < 0.5, f'warm start did not load donor weights: {np.median(rel)}'


@pytest.mark.heavy  # mesh train step covered by test_train_loop_end_to_end; learning by test_convergence (full tier)
def test_multi_epoch_training_learns_on_full_mesh(fold_dir, tmp_path):
    """5 epochs on the full 8-device mesh (batch 8 -> 1 frame/device):
    training loss must decrease substantially — validates that the sharded
    step + replicated optimizer actually learn, not just run (VERDICT r1 §7)."""
    import jax
    import pandas as pd

    from octseg.train.train import pick_mesh_size, train_model

    assert jax.device_count() == 8  # conftest guarantees; double-check here
    assert pick_mesh_size(8, jax.device_count()) == 8

    cfg = Config(
        data_dir=fold_dir,
        classes=['Lumen'],
        architecture='Unet',
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        weight_decay=0.0,
        input_size=64,
        batch_size=8,
        epochs=5,
        use_augmentation=False,
        save_dir=str(tmp_path / 'models'),
        model_name='mesh_learn',
        seed=11,
        native_loader=False,
    )
    train_model(cfg)
    df = pd.read_csv(tmp_path / 'models' / 'mesh_learn' / 'metrics.csv')
    losses = (
        df[(df['Split'] == 'train') & (df['Class'] == 'Mean')]
        .sort_values('Epoch')['Loss']
        .to_numpy()
    )
    assert len(losses) == 5
    assert losses[-1] < losses[0] * 0.8, f'train loss did not decrease: {losses}'


def test_folds_driver_on_mesh(tmp_path):
    """5-fold driver smoke (2 folds, 1 epoch) on the mesh: per-fold model
    dirs with the full contract + folds_summary.csv."""
    import pandas as pd

    from octseg.train.folds import train_folds

    cv = tmp_path / 'cv'
    rng = np.random.default_rng(7)
    for k in (1, 2):
        make_fold(str(cv / f'fold_{k}'), n_train=4, n_test=4, rng=rng)

    cfg = Config(
        cv_dir=str(cv),
        folds=[1, 2],
        classes=['Lumen'],
        architecture='Unet',
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        # identical hyperparameters to test_train_loop_end_to_end so the two
        # tests share ONE compile of the train/eval step programs
        weight_decay=1e-4,
        input_size=64,
        batch_size=4,
        epochs=1,
        use_augmentation=True,
        save_dir=str(tmp_path / 'models'),
        model_name='cvrun',
        seed=11,
        native_loader=False,
    )
    results = train_folds(cfg)
    assert [r['fold'] for r in results] == [1, 2]
    root = tmp_path / 'models' / 'cvrun'
    for k in (1, 2):
        assert (root / f'fold_{k}' / 'weights.ckpt').exists()
        assert (root / f'fold_{k}' / 'metrics.csv').exists()
    df = pd.read_csv(root / 'folds_summary.csv')
    assert list(df['fold']) == [1, 2]


@pytest.mark.heavy  # submesh queue also certified by dryrun_multichip; fold driver covered by test_folds_driver_on_mesh
def test_concurrent_folds_on_submeshes(tmp_path):
    """concurrent_folds=2 trains two folds simultaneously on disjoint
    4-device submeshes of the 8-device mesh (fold-parallelism, SURVEY §2.7)."""
    import pandas as pd

    from octseg.train.folds import train_folds

    cv = tmp_path / 'cv'
    rng = np.random.default_rng(13)
    for kf in (1, 2):
        make_fold(str(cv / f'fold_{kf}'), n_train=4, n_test=4, rng=rng)

    cfg = Config(
        cv_dir=str(cv),
        folds=[1, 2],
        concurrent_folds=2,
        classes=['Lumen'],
        architecture='Unet',
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        weight_decay=0.0,
        input_size=64,
        batch_size=4,
        epochs=1,
        use_augmentation=False,
        save_dir=str(tmp_path / 'models'),
        model_name='cvpar',
        seed=11,
        native_loader=False,
    )
    results = train_folds(cfg)
    assert sorted(r['fold'] for r in results) == [1, 2]
    root = tmp_path / 'models' / 'cvpar'
    for kf in (1, 2):
        assert (root / f'fold_{kf}' / 'weights.ckpt').exists()
    df = pd.read_csv(root / 'folds_summary.csv')
    assert sorted(df['fold']) == [1, 2]


def test_resume_interval_gates_resume_ckpt(fold_dir, tmp_path):
    """resume_interval=3 with 2 epochs: no resume.ckpt until the final epoch
    (always written), and weights.ckpt still tracks best val loss."""
    from octseg.train.train import train_model

    cfg = Config(
        data_dir=fold_dir, classes=['Lumen'], architecture='Unet',
        encoder='resnet18', optimizer='Adam', lr=1e-3, weight_decay=0.0,
        input_size=64, batch_size=4, epochs=2, use_augmentation=False,
        save_dir=str(tmp_path / 'models'), model_name='ri', seed=11,
        native_loader=False, resume_interval=3,
    )
    train_model(cfg)
    d = tmp_path / 'models' / 'ri'
    assert (d / 'weights.ckpt').exists()
    # epoch 2 == cfg.epochs -> final-epoch resume save fires even though
    # 2 % 3 != 0
    assert (d / 'resume.ckpt').exists()


def test_tiny_last_val_batch_and_finished_resume(tmp_path):
    """Two resilience cases: (a) a final val batch SMALLER than the mesh pad
    (5 samples, batch 4, 4-mesh -> last batch n=1 needs 3 pad rows — index
    wrap, not imgs[:pad]); (b) resuming a run already at its final epoch must
    return a usable summary instead of {}."""
    from octseg.train.train import train_model

    root = str(tmp_path / 'fold')
    make_fold(root, n_train=4, n_test=5, size=64)
    cfg = Config(
        data_dir=root,
        classes=['Lumen'],
        architecture='Unet',
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        weight_decay=0.0,
        input_size=64,
        batch_size=4,
        epochs=1,
        use_augmentation=False,
        save_dir=str(tmp_path / 'models'),
        model_name='tiny_val',
        seed=11,
    )
    summary = train_model(cfg)
    assert summary['epochs_done'] == 1

    cfg['resume'] = True  # nothing left to train: epochs == resume epoch
    summary2 = train_model(cfg)
    assert summary2['epochs_done'] == 1
    assert 'last_val_f1' in summary2 and 'best_metrics' in summary2
    assert summary2['best_val_loss'] <= summary['best_val_loss'] + 1e-9


def test_train_split_smaller_than_batch_raises_clearly(tmp_path):
    from octseg.train.train import train_model

    root = str(tmp_path / 'fold')
    make_fold(root, n_train=2, n_test=2, size=64)
    cfg = Config(
        data_dir=root, classes=['Lumen'], architecture='Unet',
        encoder='resnet18', optimizer='Adam', lr=1e-3, weight_decay=0.0,
        input_size=64, batch_size=4, epochs=1, use_augmentation=False,
        save_dir=str(tmp_path / 'models'), model_name='too_small', seed=11,
        native_loader=False,
    )
    with pytest.raises(ValueError, match='smaller than'):
        train_model(cfg)
