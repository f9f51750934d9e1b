"""trunc_exp: exp with clamped input gradient (torch-ngp semantics)."""
import torch


class _TruncExp(torch.autograd.Function):

    @staticmethod
    def forward(ctx, x):
        ctx.save_for_backward(x)
        return torch.exp(x)

    @staticmethod
    def backward(ctx, grad):
        x, = ctx.saved_tensors
        return grad * torch.exp(torch.clamp(x, max=15.0))


def trunc_exp(x):
    return _TruncExp.apply(x)
