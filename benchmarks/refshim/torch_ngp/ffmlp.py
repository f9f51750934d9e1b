"""FFMLP stand-in: imported by autolabel/models.py:9 but never
instantiated by the reference's code paths."""


class FFMLP:

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'FFMLP is not used by any autolabel code path; the shim only '
            'satisfies the import.')
