"""End-to-end training smoke for the decoder families made SMP-channel-exact
in round 3 (FPN / DeepLabV3+ as representatives of the upsampled-head and
dilated-encoder groups).

The reference trains any of its 9 architectures through the same entry point
(reference src/models/smp/model.py:38-44 creates them; configs/tune.yaml
sweeps all 9), so the train->checkpoint->evaluate contract must hold for the
newly-exact decoders too, not just the three winning configs.
"""

import pandas as pd
import pytest

from octseg.core.config import Config
from tests.test_train import make_fold


@pytest.fixture(scope='module')
def fold_dir(tmp_path_factory):
    return make_fold(str(tmp_path_factory.mktemp('fold')))


@pytest.mark.slow
@pytest.mark.parametrize('arch', ['FPN', 'DeepLabV3Plus'])
def test_train_checkpoint_evaluate_new_decoder(fold_dir, tmp_path, arch):
    from octseg.train.evaluate import evaluate_model
    from octseg.train.train import train_model

    cfg = Config(
        data_dir=fold_dir,
        classes=['Lumen'],
        architecture=arch,
        encoder='resnet18',
        optimizer='Adam',
        lr=1e-3,
        weight_decay=0.0,
        input_size=64,
        batch_size=4,
        epochs=1,
        use_augmentation=False,
        save_dir=str(tmp_path / 'models'),
        model_name=f'smoke_{arch}',
        seed=11,
        native_loader=False,
    )
    summary = train_model(cfg)
    assert summary['epochs_done'] == 1

    model_dir = tmp_path / 'models' / f'smoke_{arch}'
    assert (model_dir / 'weights.ckpt').exists()
    assert (model_dir / 'config.json').exists()
    df = pd.read_csv(model_dir / 'metrics.csv')
    assert set(df['Split']) == {'train', 'test'}

    # the saved checkpoint must round-trip through the evaluation harness
    res = evaluate_model(str(model_dir), str(fold_dir), batch_size=4)
    assert 0.0 <= res['Lumen']['dice'] <= 1.0
    assert set(res['Mean']) == {'iou', 'dice', 'precision', 'recall', 'f1'}
