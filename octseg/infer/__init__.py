from octseg.infer.engine import InferenceEngine, load_model_bundle

__all__ = ['InferenceEngine', 'load_model_bundle']
