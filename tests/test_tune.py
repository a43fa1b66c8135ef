import numpy as np
import pandas as pd
import pytest

from octseg.core.config import Config
from octseg.tune.search import BayesianSearch, HyperBand, SearchSpace

SPACE_CFG = Config(
    architecture=['Unet', 'FPN'],
    encoder=['resnet18', 'efficientnet-b0'],
    optimizer=['Adam', 'RMSprop'],
    learning_rate=[1e-3, 1e-4],
    input_size_min=512,
    input_size_step=128,
    input_size_max=896,
)


def test_search_space():
    space = SearchSpace.from_config(SPACE_CFG)
    assert space.params['input_size'] == [512, 640, 768, 896]
    assert space.size == 2 * 2 * 2 * 2 * 4
    rng = np.random.default_rng(0)
    p = space.sample(rng)
    enc = space.encode(p)
    assert enc.sum() == len(space.names)  # one-hot per param


def test_bayesian_search_converges_to_good_region():
    space = SearchSpace.from_config(SPACE_CFG)
    search = BayesianSearch(space, seed=0, n_random=8)

    def score(p):  # hidden objective: Unet + lr 1e-3 is best
        return (p['architecture'] == 'Unet') * 0.5 + (p['lr'] == 1e-3) * 0.3

    picks = []
    for _ in range(30):
        p = search.suggest()
        search.observe(p, score(p) + np.random.default_rng(1).normal(0, 0.01))
        picks.append(p)
    late = picks[-10:]
    frac_unet = sum(p['architecture'] == 'Unet' for p in late) / len(late)
    assert frac_unet >= 0.5  # exploitation kicked in


def test_hyperband_stops_bad_runs():
    hb_hist = HyperBand(min_iter=2, eta=2, max_iter=16, s=2)
    assert hb_hist.rungs == [2, 4, 8]
    # seed history with good runs
    for v in (0.8, 0.9, 0.7):
        assert not v < 0 and hb_hist.should_stop(2, v) in (True, False)
    # a clearly bad run at the rung should be cut
    assert hb_hist.should_stop(2, 0.01)
    # non-rung epochs never stop
    assert not hb_hist.should_stop(3, 0.0)


@pytest.mark.slow
def test_sweep_end_to_end(tmp_path):
    from octseg.tune.tune import run_sweep
    from tests.test_train import make_fold

    fold = make_fold(str(tmp_path / 'fold'), n_train=8, n_test=4, size=64)
    cfg = Config(
        data_dir=fold,
        classes=['Lumen'],
        architecture=['Unet'],
        encoder=['resnet18'],
        optimizer=['Adam'],
        learning_rate=[1e-3, 1e-4],
        input_size_min=64,
        input_size_step=128,
        input_size_max=64,
        batch_size=4,
        epochs=1,
        num_trials=2,
        save_dir=str(tmp_path / 'tuning'),
        use_augmentation=False,
        seed=11,
    )
    best = run_sweep(cfg)
    df = pd.read_csv(tmp_path / 'tuning' / 'tuning_results.csv')
    assert len(df) == 2
    assert set(df['status']) == {'ok'}
    assert best['val_f1'] >= 0
