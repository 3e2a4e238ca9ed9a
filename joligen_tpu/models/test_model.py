"""Test-only generator wrapper (reference models/test_model.py): loads a
single G for one-direction inference, no training."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .gan_networks import define_G
from .train_state import init_net_state, make_optimizer


class TestModel(BaseModel):
    def __init__(self, opt, phase="test"):
        super().__init__(opt, phase)
        self.netG = define_G(opt)
        size = opt.data_crop_size
        ex = jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)
        tx = make_optimizer(opt, 1e-4)
        # reference models/test_model.py:24-33: checkpoints are loaded as
        # [epoch]_net_G<model_suffix>.pth
        name = "G" + (getattr(opt, "model_suffix", "") or "_A")
        self._g_name = name
        self.txs[name] = tx
        self.states[name] = init_net_state(self.next_rng(), self.netG,
                                           (ex,), tx)
        self._jit = None

    def optimize_parameters(self, batch):
        raise RuntimeError("TestModel is inference-only (reference "
                           "models/test_model.py)")

    def inference(self, batch, use_ema=True, **kwargs):
        dev = self.put_batch({"A": batch["A"]})
        state = self.states[self._g_name]
        params = state.ema_params if (use_ema and state.ema_params
                                      is not None) else state.params
        if self._jit is None:
            self._jit = jax.jit(lambda p, x: self.netG.apply(p, x))
        return np.asarray(jax.device_get(
            self._jit(self.replicated(params), dev["A"])))
