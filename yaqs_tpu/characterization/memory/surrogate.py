"""Transformer surrogate for process-tensor responses (flax/optax).

Reference: mqt-yaqs characterization/memory/backends/surrogates — a causal
TransformerEncoder over per-step Choi features predicting the final system
state; the reference uses torch (optional extra), this build uses flax so
training runs on the same TPU runtime as everything else.

Pipeline: :func:`sample_dataset` simulates random MP sequences on the exact
backend (one vmapped batch); :func:`train_surrogate` fits the model to the
rho8 encoding (Re/Im of the flattened unnormalized final density matrix);
:class:`ProcessTensorSurrogate.evaluate_probes` plugs into the operational
memory workflow like any other backend.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

try:  # flax/optax are part of the baked environment; guard for safety
    import flax.linen as nn
    import optax

    HAS_FLAX = True
except ImportError:  # pragma: no cover
    HAS_FLAX = False

from .exact import ExactBackend
from .interventions import MPIntervention, sample_intervention

__all__ = ["sample_dataset", "train_surrogate", "ProcessTensorSurrogate"]


def pack_rho8(rho: np.ndarray) -> np.ndarray:
    return np.concatenate([rho.real.reshape(-1), rho.imag.reshape(-1)]).astype(np.float32)


def unpack_rho8(v: np.ndarray) -> np.ndarray:
    re = np.asarray(v[:4], dtype=np.float64).reshape(2, 2)
    im = np.asarray(v[4:], dtype=np.float64).reshape(2, 2)
    rho = re + 1j * im
    return (rho + rho.conj().T) / 2  # hermitize


def sample_dataset(
    hamiltonian,
    *,
    num_interventions: int,
    tau: float,
    num_sequences: int = 256,
    noise_model=None,
    seed: int | None = 0,
    intervention_style: str = "haar",
):
    """Simulate random MP sequences -> (features (N,k,32), rho8 (N,8))."""
    if num_interventions < 1:
        msg = f"num_interventions must be >= 1, got {num_interventions}"
        raise ValueError(msg)
    if num_sequences < 1:
        msg = f"num_sequences must be >= 1, got {num_sequences}"
        raise ValueError(msg)
    if not np.isfinite(tau):
        msg = f"tau must be finite, got {tau}"
        raise ValueError(msg)
    rng = np.random.default_rng(seed)
    k = num_interventions
    seqs = [
        [sample_intervention(rng, intervention_style) for _ in range(k)]
        for _ in range(num_sequences)
    ]
    kraus = np.stack([[iv.kraus for iv in s] for s in seqs])
    backend = ExactBackend(hamiltonian, tau, noise_model)
    rhos = backend.evaluate_kraus_sequences(kraus)
    feats = np.stack([[iv.features() for iv in s] for s in seqs])
    targets = np.stack([pack_rho8(r) for r in rhos])
    return {"features": feats, "targets": targets, "num_interventions": k, "tau": tau}


if HAS_FLAX:

    class _CausalTransformer(nn.Module):
        d_model: int = 64
        n_heads: int = 4
        n_layers: int = 2

        @nn.compact
        def __call__(self, x):  # x (batch, k, 32)
            k = x.shape[1]
            h = nn.Dense(self.d_model)(x)
            pos = np.arange(k)[:, None] / np.maximum(
                10000 ** (np.arange(self.d_model)[None, :] / self.d_model), 1e-9
            )
            pe = np.concatenate(
                [np.sin(pos[:, 0::2]), np.cos(pos[:, 1::2])], axis=1
            ).astype(np.float32)
            h = h + jnp.asarray(pe)[None]
            mask = jnp.tril(jnp.ones((k, k), dtype=bool))
            for _ in range(self.n_layers):
                attn = nn.MultiHeadDotProductAttention(
                    num_heads=self.n_heads, qkv_features=self.d_model
                )(h, mask=mask[None, None])
                h = nn.LayerNorm()(h + attn)
                ff = nn.Dense(4 * self.d_model)(h)
                ff = nn.gelu(ff)
                ff = nn.Dense(self.d_model)(ff)
                h = nn.LayerNorm()(h + ff)
            return nn.Dense(8)(h[:, -1])


@dataclasses.dataclass
class ProcessTensorSurrogate:
    """Trained surrogate exposing the operational-memory backend protocol."""

    params: dict
    model: object
    num_interventions: int

    def _num_interventions_for_probe(self) -> int:
        return self.num_interventions

    def predict_features(self, feats: np.ndarray) -> np.ndarray:
        out = self.model.apply({"params": self.params}, jnp.asarray(feats, jnp.float32))
        return np.asarray(out)

    def evaluate_probes(self, sequences: list[list[MPIntervention]]) -> np.ndarray:
        bad = {len(s) for s in sequences} - {self.num_interventions}
        if bad:
            msg = (
                f"surrogate was trained for {self.num_interventions} interventions "
                f"per sequence; got sequence length(s) {sorted(bad)}"
            )
            raise ValueError(msg)
        feats = np.stack([[iv.features() for iv in s] for s in sequences])
        rho8 = self.predict_features(feats)
        return np.stack([unpack_rho8(v) for v in rho8])


def train_surrogate(
    dataset,
    *,
    epochs: int = 300,
    learning_rate: float = 1e-3,
    d_model: int = 64,
    n_heads: int = 4,
    n_layers: int = 2,
    batch_size: int = 64,
    seed: int = 0,
    verbose: bool = False,
) -> ProcessTensorSurrogate:
    if not HAS_FLAX:  # pragma: no cover
        msg = "flax/optax are required for surrogate training"
        raise ImportError(msg)
    feats = jnp.asarray(dataset["features"], jnp.float32)
    targets = jnp.asarray(dataset["targets"], jnp.float32)
    model = _CausalTransformer(d_model=d_model, n_heads=n_heads, n_layers=n_layers)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, feats[:1])["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = model.apply({"params": p}, xb)
            return jnp.mean((pred - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = feats.shape[0]
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            params, opt_state, loss = step(params, opt_state, feats[idx], targets[idx])
        if verbose and epoch % 50 == 0:
            print(f"[surrogate] epoch {epoch}: loss {float(loss):.3e}")

    return ProcessTensorSurrogate(
        params=params, model=model, num_interventions=int(dataset["num_interventions"])
    )
