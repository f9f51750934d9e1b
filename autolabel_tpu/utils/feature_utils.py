"""Import-path parity shim: the reference exposes the extractor dispatch
as autolabel.utils.feature_utils (utils/feature_utils.py:1-12)."""
from autolabel_tpu.features.feature_utils import get_feature_extractor

__all__ = ['get_feature_extractor']
