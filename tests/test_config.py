import os

import pytest

from octseg.core.config import Config, load_config, parse_overrides


@pytest.fixture
def config_dir(tmp_path):
    (tmp_path / 'main.yaml').write_text('project_name: OCT segmentation\nseed: 11\n')
    (tmp_path / 'train.yaml').write_text(
        'defaults:\n- main\n- _self_\n\n'
        'data_dir: data/cv/fold_1\nlr: 0.0001\nclasses:\n- Lumen\n'
        'nested:\n  a: 1\n  b: 2\n'
    )
    return str(tmp_path)


def test_composition_and_attribute_access(config_dir):
    cfg = load_config('train', config_dir=config_dir)
    assert cfg.project_name == 'OCT segmentation'  # from main
    assert cfg.seed == 11
    assert cfg.lr == 0.0001
    assert cfg.classes == ['Lumen']
    assert cfg.nested.a == 1


def test_cli_overrides(config_dir):
    cfg = load_config(
        'train',
        overrides=['lr=0.01', 'classes=[Lumen,"Fibrous cap"]', 'nested.b=7',
                   'new_key=hello', 'flag=true'],
        config_dir=config_dir,
    )
    assert cfg.lr == 0.01
    assert cfg.classes == ['Lumen', 'Fibrous cap']
    assert cfg.nested.b == 7 and cfg.nested.a == 1
    assert cfg.new_key == 'hello'
    assert cfg.flag is True


def test_parse_overrides_typing():
    out = parse_overrides(['a=1', 'b=1e-5', 'c=null', 'd=[1,2]', 'e=text'])
    assert out['a'] == 1 and out['b'] == 1e-5 and out['c'] is None
    assert out['d'] == [1, 2] and out['e'] == 'text'
    with pytest.raises(ValueError):
        parse_overrides(['no_equals_sign'])


def test_parse_overrides_coerces_scientific_notation_in_lists():
    """learning_rate=[1e-3,1e-4] must arrive as floats, not strings — the
    tuner CLI regression caught in r2 (every trial failed on a string lr)."""
    out = parse_overrides(['learning_rate=[1e-3,1e-4]', 'mixed=[1e-2,x,3]'])
    assert out['learning_rate'] == [1e-3, 1e-4]
    assert out['mixed'] == [1e-2, 'x', 3]


def test_config_to_yaml_roundtrip():
    import yaml

    cfg = Config(a=1, b={'c': [1, 2]}, d='x')
    back = yaml.safe_load(cfg.to_yaml())
    assert back == {'a': 1, 'b': {'c': [1, 2]}, 'd': 'x'}


def test_repo_configs_all_loadable():
    import octseg

    config_dir = os.path.join(octseg.PROJECT_DIR, 'configs')
    for fname in sorted(os.listdir(config_dir)):
        if fname.endswith('.yaml') and fname != 'main.yaml':
            cfg = load_config(fname[:-5], config_dir=config_dir)
            assert cfg.get('project_name') == 'OCT segmentation', fname


def test_scalar_logger(tmp_path):
    import json

    from octseg.core.logging_utils import ScalarLogger

    logger = ScalarLogger(str(tmp_path))
    logger.log_scalars({'loss': 0.5, 'f1': 0.8}, step=1)
    logger.log_scalars({'loss': 0.4, 'f1': 0.9}, step=2)
    lines = [json.loads(line) for line in open(tmp_path / 'scalars.jsonl')]
    assert lines[0] == {'step': 1, 'loss': 0.5, 'f1': 0.8}
    assert logger.update_summary('best_f1', 0.8)
    assert logger.update_summary('best_f1', 0.9)
    assert not logger.update_summary('best_f1', 0.7)
    assert logger.summary['best_f1'] == 0.9


def test_compilation_cache_writes_entries(tmp_path, monkeypatch):
    """enable_compilation_cache points XLA's persistent cache at the given
    dir; a slow-enough compile must land an entry there (the env kill
    switch and the idempotent re-enable are exercised too)."""
    import jax as _jax

    import octseg.core.compilecache as cc

    # the suite-wide cache dir (conftest) must be restored afterwards — a
    # `None` here used to disable the persistent cache for every test that
    # ran after this one, silently forfeiting all warm-run compile reuse
    suite_cache_dir = _jax.config.jax_compilation_cache_dir

    monkeypatch.setattr(cc, '_enabled_dir', None)
    monkeypatch.setenv('OCTSEG_COMPILE_CACHE', '0')
    assert cc.enable_compilation_cache(str(tmp_path / 'x')) is None

    monkeypatch.delenv('OCTSEG_COMPILE_CACHE', raising=False)
    cache_dir = str(tmp_path / 'xla-cache')
    got = cc.enable_compilation_cache(cache_dir)
    if got is None:  # this jax build lacks the persistent-cache knobs
        pytest.skip('persistent compilation cache unsupported')
    assert got == cache_dir
    # idempotent: a second call (no args) keeps the first dir
    assert cc.enable_compilation_cache() == cache_dir

    import jax
    import jax.numpy as jnp

    try:
        # force every compile into the cache for this check
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        x = jnp.ones((4, 32, 32, 8), jnp.float32)
        w = jnp.ones((3, 3, 8, 16), jnp.float32)
        # a per-run constant makes the HLO unique: an identical program
        # compiled earlier in this process would hit jax's in-memory cache
        # and never write to the redirected dir (order-dependent flake)
        import uuid

        salt = float(uuid.uuid4().int % 10 ** 9) / 1e9
        jax.jit(
            lambda x, w: jax.lax.conv_general_dilated(
                x + salt, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        ).lower(x, w).compile()
        assert os.listdir(cache_dir), 'no cache entry written'
    finally:
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_compilation_cache_dir', suite_cache_dir)
        # enable_compilation_cache reset the cache singleton onto this
        # test's tmp dir; point it back at the suite-wide cache
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
        monkeypatch.setattr(cc, '_enabled_dir', None)
