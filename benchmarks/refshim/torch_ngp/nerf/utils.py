"""Trainer stand-in: the services torch-ngp's Trainer provides to the
reference's SimpleTrainer/InteractiveTrainer subclasses
(autolabel/trainer.py: self.model/device/opt/criterion/optimizer(s)/
scaler/ema/lr_scheduler(s)/epoch/local_rank/use_tensorboardX/workspace,
checkpoint save/resume, evaluate loop)."""
import glob
import os

import numpy as np
import torch


class ExponentialMovingAverage:
    """Minimal torch_ema-equivalent: shadow copies + lerp on update()."""

    def __init__(self, parameters, decay):
        self.decay = decay
        self._params = list(parameters)
        self._shadow = [p.detach().clone() for p in self._params]

    @torch.no_grad()
    def update(self):
        for shadow, param in zip(self._shadow, self._params):
            shadow.mul_(self.decay).add_(param, alpha=1.0 - self.decay)

    @torch.no_grad()
    def copy_to(self, parameters=None):
        for shadow, param in zip(self._shadow, parameters or self._params):
            param.copy_(shadow)

    def state_dict(self):
        return {'decay': self.decay, 'shadow': self._shadow}

    def load_state_dict(self, state):
        self.decay = state['decay']
        self._shadow = state['shadow']


class Trainer:

    def __init__(self,
                 name,
                 opt,
                 model,
                 device='cuda:0',
                 workspace=None,
                 optimizer=None,
                 criterion=None,
                 fp16=False,
                 ema_decay=None,
                 lr_scheduler=None,
                 scheduler_update_every_step=False,
                 metrics=None,
                 use_checkpoint='latest',
                 local_rank=0,
                 use_tensorboardX=False):
        self.name = name
        self.opt = opt
        if device.startswith('cuda') and not torch.cuda.is_available():
            device = 'cpu'  # CPU-anchor baseline runs (no CUDA here)
        self.device = torch.device(device)
        self.model = model.to(self.device)
        self.criterion = criterion
        self.fp16 = fp16 and torch.cuda.is_available()
        self.workspace = workspace
        self.local_rank = local_rank
        self.use_tensorboardX = use_tensorboardX
        self.metrics = metrics or []
        self.epoch = 0
        self.global_step = 0

        self.optimizer = optimizer(self.model) if callable(optimizer) \
            else optimizer
        self.optimizers = [self.optimizer]
        self.scaler = torch.cuda.amp.GradScaler(enabled=self.fp16)
        self.ema = (ExponentialMovingAverage(self.model.parameters(),
                                             ema_decay)
                    if ema_decay is not None else None)
        self.lr_scheduler = (lr_scheduler(self.optimizer)
                             if callable(lr_scheduler) else lr_scheduler)
        self.lr_schedulers = [s for s in [self.lr_scheduler] if s is not None]

        if workspace is not None:
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            if use_checkpoint == 'latest':
                self.load_checkpoint()

    # -- checkpoints -----------------------------------------------------

    @property
    def checkpoint_dir(self):
        return os.path.join(self.workspace, 'checkpoints')

    def save_checkpoint(self, name=None):
        if self.workspace is None:
            return
        if name is None:
            name = f'{self.name}_ep{self.epoch:04d}'
        payload = {
            'model': self.model.state_dict(),
            'epoch': self.epoch,
            'global_step': self.global_step,
        }
        torch.save(payload, os.path.join(self.checkpoint_dir, f'{name}.pth'))

    def load_checkpoint(self):
        paths = sorted(glob.glob(f'{self.checkpoint_dir}/*.pth'))
        if not paths:
            return
        payload = torch.load(paths[-1], map_location=self.device)
        self.model.load_state_dict(payload['model'])
        self.epoch = payload.get('epoch', 0)
        self.global_step = payload.get('global_step', 0)

    # -- evaluation ---------------------------------------------------------

    def evaluate(self, dataloader):
        self.model.eval()
        losses = []
        with torch.no_grad():
            for data in dataloader:
                pred_rgb, _, _, gt_rgb, _ = self.eval_step(data)
                losses.append(
                    float(torch.mean((pred_rgb - gt_rgb) ** 2)))
        mse = float(np.mean(losses))
        print(f'eval: mse={mse:.5f} psnr={-10 * np.log10(mse):.2f}dB')
        return mse
