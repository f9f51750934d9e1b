"""tensorboardX stand-in: a SummaryWriter that records nothing.

Imported unconditionally by /root/reference/autolabel/trainer.py:2; the
reference only writes scalars when use_tensorboardX is set, which the
baseline runs leave off.
"""


class SummaryWriter:

    def __init__(self, *args, **kwargs):
        pass

    def add_scalar(self, *args, **kwargs):
        pass

    def add_image(self, *args, **kwargs):
        pass

    def flush(self):
        pass

    def close(self):
        pass
