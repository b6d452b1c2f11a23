from dgll_tpu.cache.feature_cache import HBMFeatureCache

__all__ = ["HBMFeatureCache"]
