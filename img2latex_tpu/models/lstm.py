"""Stacked LSTM with PyTorch gate order, designed for the TPU MXU.

The reference uses ``torch.nn.LSTM`` (``img2latex/model/decoder.py:76-82``) and
— on the attention path — steps it one timestep at a time from Python
(``decoder.py:164-193``), the hottest loop in the project.  Here:

* **Teacher-forced sequences**: the input projection ``x @ W_ih + b_ih`` for
  ALL timesteps of a layer is one large batched matmul (MXU-friendly,
  ``(B*T, In) x (In, 4H)``); only the recurrence ``h @ W_hh`` runs inside a
  ``lax.scan``.  This is the classic input-projection hoisting that makes LSTM
  training compute-bound on the matrix unit instead of latency-bound.
* **Decode**: :meth:`step` advances all layers one timestep for the scan-based
  greedy/beam/sampling loops.

Gate order is PyTorch's ``(i, f, g, o)`` and the parameter layout is
``W_ih: (In, 4H)``, ``W_hh: (H, 4H)`` (transposed from torch), so torch
checkpoints convert with a single transpose.  Init matches torch LSTM:
``U(-1/sqrt(H), 1/sqrt(H))`` for all weights and biases.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Carry = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c), each (num_layers, B, H)


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def lstm_cell_step(
    gates_x: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
    W_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One cell update from a precomputed input projection.

    gates_x: (B, 4H) = x @ W_ih + b_ih;  h, c: (B, H).
    """
    gates = gates_x + h @ W_hh + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class StackedLSTM(nn.Module):
    """Multi-layer LSTM; dropout between layers (torch semantics: applied to
    every layer's output except the last, only when ``num_layers > 1``)."""

    input_dim: int
    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Run full-sequence forwards through the whole-sequence Pallas kernel
    # (ops/pallas/lstm_train.py, custom-VJP backward) instead of lax.scan.
    # Same math, f32 gate arithmetic, f32 dW_hh accumulation; kills the
    # ~20 us/step XLA scan overhead (see the kernel's docstring).
    pallas_seq: bool = False
    pallas_interpret: bool = False

    def setup(self):
        scale = 1.0 / (self.hidden_dim**0.5)
        init = _uniform_init(scale)
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for layer in range(self.num_layers):
            in_dim = self.input_dim if layer == 0 else self.hidden_dim
            w_ih.append(
                self.param(f"W_ih_l{layer}", init, (in_dim, 4 * self.hidden_dim), self.param_dtype)
            )
            w_hh.append(
                self.param(
                    f"W_hh_l{layer}", init, (self.hidden_dim, 4 * self.hidden_dim), self.param_dtype
                )
            )
            b_ih.append(self.param(f"b_ih_l{layer}", init, (4 * self.hidden_dim,), self.param_dtype))
            b_hh.append(self.param(f"b_hh_l{layer}", init, (4 * self.hidden_dim,), self.param_dtype))
        self.w_ih, self.w_hh, self.b_ih, self.b_hh = w_ih, w_hh, b_ih, b_hh
        self.drop = nn.Dropout(rate=self.dropout)

    # ------------------------------------------------------------------
    def init_carry(self, batch_size: int) -> Carry:
        shape = (self.num_layers, batch_size, self.hidden_dim)
        return (jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))

    def _layer(self, layer: int):
        c = lambda a: a.astype(self.dtype)
        return c(self.w_ih[layer]), c(self.w_hh[layer]), c(self.b_ih[layer]), c(self.b_hh[layer])

    # ------------------------------------------------------------------
    def __call__(
        self,
        xs: jnp.ndarray,
        carry: Optional[Carry] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Carry]:
        """Full-sequence forward.  xs: (B, T, input_dim) -> (B, T, H)."""
        B = xs.shape[0]
        if carry is None:
            carry = self.init_carry(B)
        h0, c0 = carry
        ys = xs.astype(self.dtype)
        h_out, c_out = [], []
        for layer in range(self.num_layers):
            W_ih, W_hh, b_ih, b_hh = self._layer(layer)
            if self.pallas_seq:
                from img2latex_tpu.ops.pallas.lstm_train import lstm_seq_pallas

                # Both biases are step-invariant — fold them into the hoisted
                # projection so the kernel is matmul + gates only.
                gates_x = ys @ W_ih + (b_ih + b_hh)  # (B, T, 4H)
                gates_x_t = jnp.swapaxes(gates_x, 0, 1)
                ys_t, hT, cT = lstm_seq_pallas(
                    gates_x_t,
                    h0[layer],
                    c0[layer],
                    W_hh,
                    interpret=self.pallas_interpret,
                )
                ys = jnp.swapaxes(ys_t, 0, 1)
                h_out.append(hT)
                c_out.append(cT)
                if layer < self.num_layers - 1 and self.num_layers > 1:
                    ys = self.drop(ys, deterministic=deterministic)
                continue
            # Hoisted input projection: one big matmul over all timesteps.
            gates_x = ys @ W_ih + b_ih  # (B, T, 4H)
            gates_x_t = jnp.swapaxes(gates_x, 0, 1)  # (T, B, 4H) time-major scan

            def scan_fn(hc, gx, W_hh=W_hh, b_hh=b_hh):
                h, c = hc
                h2, c2 = lstm_cell_step(gx, h, c, W_hh, b_hh)
                return (h2, c2), h2

            (hT, cT), ys_t = jax.lax.scan(scan_fn, (h0[layer], c0[layer]), gates_x_t)
            ys = jnp.swapaxes(ys_t, 0, 1)  # (B, T, H)
            if layer < self.num_layers - 1 and self.num_layers > 1:
                ys = self.drop(ys, deterministic=deterministic)
            h_out.append(hT)
            c_out.append(cT)
        return ys, (jnp.stack(h_out), jnp.stack(c_out))

    # ------------------------------------------------------------------
    def step(
        self, x: jnp.ndarray, carry: Carry, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Carry]:
        """Single-timestep forward for decode loops.  x: (B, input_dim)."""
        h0, c0 = carry
        y = x.astype(self.dtype)
        h_out, c_out = [], []
        for layer in range(self.num_layers):
            W_ih, W_hh, b_ih, b_hh = self._layer(layer)
            gates_x = y @ W_ih + b_ih
            h2, c2 = lstm_cell_step(gates_x, h0[layer], c0[layer], W_hh, b_hh)
            y = h2
            if layer < self.num_layers - 1 and self.num_layers > 1:
                y = self.drop(y, deterministic=deterministic)
            h_out.append(h2)
            c_out.append(c2)
        return y, (jnp.stack(h_out), jnp.stack(c_out))
