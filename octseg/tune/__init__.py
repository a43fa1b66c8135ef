from octseg.tune.search import BayesianSearch, HyperBand, SearchSpace

__all__ = ['SearchSpace', 'BayesianSearch', 'HyperBand']
