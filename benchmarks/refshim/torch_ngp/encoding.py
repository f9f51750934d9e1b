"""get_encoder stand-in (used by the reference's 'hg' encoding path,
autolabel/models.py:143)."""
from torch_ngp.gridencoder import GridEncoder


def get_encoder(encoding, **kwargs):
    if encoding == 'hashgrid':
        encoder = GridEncoder(**kwargs)
        return encoder, encoder.output_dim
    raise NotImplementedError(f'encoding {encoding}')
