"""Inference package. Engine exports resolve lazily (PEP 562) so that
jax-free surfaces — the service client's quant mode (octseg.infer.client) —
can import siblings without pulling in the engine's jax stack."""

__all__ = ['InferenceEngine', 'load_model_bundle']


def __getattr__(name):
    if name in __all__:
        from octseg.infer import engine

        return getattr(engine, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
