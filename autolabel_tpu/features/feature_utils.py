"""Teacher-extractor dispatch (parity: autolabel/utils/feature_utils.py)."""


def get_feature_extractor(features, checkpoint=None):
    if features == 'fcn50':
        from autolabel_tpu.features.fcn50 import FCN50
        return FCN50()
    elif features == 'dino':
        from autolabel_tpu.features.dino import Dino
        return Dino()
    elif features == 'lseg':
        from autolabel_tpu.features.lseg import LSegFE
        return LSegFE(checkpoint)
    raise NotImplementedError(f"Unknown feature extractor {features}")
