from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.models.autoencoder import Autoencoder
