from autolabel_tpu.ops.activation import trunc_exp
from autolabel_tpu.ops.encoders import (frequency_encode, hashgrid_encode,
                                        hashgrid_init, sh_encode,
                                        HashGridConfig)
from autolabel_tpu.ops.mlp import mlp_apply, mlp_init
