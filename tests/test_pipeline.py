import json

import pandas as pd
import pytest

from octseg.core.pipeline import Pipeline


def write_pipeline(tmp_path, stages):
    import yaml

    p = tmp_path / 'pipeline.yaml'
    p.write_text(yaml.safe_dump({'stages': stages}))
    return str(p)


def test_pipeline_runs_in_dep_order_and_caches(tmp_path, monkeypatch):
    # monkeypatch.chdir restores the cwd afterwards — a bare os.chdir leaked
    # tmp_path into every later test and broke subprocesses that resolve the
    # (non-pip-installed) octseg package via the repo-root cwd
    monkeypatch.chdir(tmp_path)
    stages = {
        'b': {'cmd': 'cat a.txt a.txt > b.txt', 'deps': ['a.txt'], 'outs': ['b.txt']},
        'a': {'cmd': 'echo hi > a.txt', 'deps': [], 'outs': ['a.txt']},
        'c': {'cmd': 'cat b.txt > c.txt', 'deps': ['b.txt'], 'outs': ['c.txt']},
    }
    pfile = write_pipeline(tmp_path, stages)
    pipe = Pipeline(pfile)
    ran = pipe.repro()
    assert ran.index('a') < ran.index('b') < ran.index('c')
    assert (tmp_path / 'c.txt').read_text().strip() == 'hi\nhi'

    # second repro: everything cached
    pipe2 = Pipeline(pfile)
    assert pipe2.repro() == []

    # modifying an out re-runs only its producer (which restores it, so
    # downstream stays fresh — dvc semantics)
    (tmp_path / 'a.txt').write_text('changed\n')
    ran3 = Pipeline(pfile).repro()
    assert ran3 == ['a']
    assert (tmp_path / 'a.txt').read_text().strip() == 'hi'

    # changing a stage command cascades through dependents
    stages['a']['cmd'] = 'echo bye > a.txt'
    pfile = write_pipeline(tmp_path, stages)
    ran4 = Pipeline(pfile).repro()
    assert ran4 == ['a', 'b', 'c']
    assert (tmp_path / 'c.txt').read_text().strip() == 'bye\nbye'


def test_get_configs_aggregator(tmp_path):
    from octseg.core.config import Config
    from octseg.tune.get_configs import main

    for cls, f1s in (('Lumen', [0.9, 0.95]), ('Vasa vasorum', [0.5, 0.6])):
        d = tmp_path / 'tuning' / cls
        d.mkdir(parents=True)
        pd.DataFrame({
            'trial': [0, 1],
            'architecture': ['Unet', 'Unet'],
            'encoder': ['resnet18', 'resnet50'],
            'optimizer': ['Adam', 'RMSprop'],
            'lr': [1e-3, 1e-4],
            'input_size': [512, 640],
            'val_f1': f1s,
            'val_loss': [0.2, 0.1],
            'epochs_done': [5, 5],
            'duration_s': [10, 12],
            'status': ['ok', 'ok'],
        }).to_csv(d / 'tuning_results.csv', index=False)
    save = tmp_path / 'eval'
    main(Config(tuning_dir=str(tmp_path / 'tuning'), save_dir=str(save), metric='val_f1'))
    best = pd.read_csv(save / 'configs_best.csv')
    assert len(best) == 2
    assert best[best['class'] == 'Lumen'].iloc[0]['val_f1'] == 0.95
    assert (save / 'configs_all.csv').exists()


@pytest.mark.slow
def test_model_info():
    from octseg.models.get_model_info import model_info

    info = model_info('Unet', 'resnet18', input_size=64, classes=1)
    assert info['params_m'] > 10  # ~14.3M
    assert info['gflops'] > 0
