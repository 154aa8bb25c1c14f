"""VAE-CF: multinomial variational autoencoder over binarized user rows.

Reference parity: beta_rec/models/vaecf.py:9-167 — encoder MLP ([n_items, 20]
with configurable activation) to (mu, logvar) of a z_dim=10 latent, decoder
mirror, likelihoods mult/bern/gaus/pois, loss = mean(beta*KL - ll). Training
batches are user rows of the binarized interaction matrix
(instance_vae_loader, data/base_data.py:513-532) — here produced on device by
the userrow epoch builder.
"""

import jax
import jax.numpy as jnp

from .base import RecModel
from .mlp import _dense_init

EPS = 1e-10

_ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
}


class VAECF(RecModel):
    batch_kind = "userrow"

    def __init__(self, config, n_users, n_items, artifacts=None):
        super().__init__(config, n_users, n_items, artifacts)
        self.z_dim = int(config.get("z_dim", 10))
        self.structure = [n_items] + list(config.get("ae_structure", [20]))
        self.act = _ACTS[config.get("activation", "tanh")]
        self.likelihood = config.get("likelihood", "mult")
        self.beta = float(config.get("beta", 1.0))
        # Eval-time scoring needs each user's interaction row.
        rows = self.artifacts.get("user_rows")
        self.user_rows = jnp.asarray(rows) if rows is not None else None

    def init_params(self, rng):
        n_enc = len(self.structure) - 1
        keys = jax.random.split(rng, 2 * n_enc + 3)
        enc = [
            _dense_init(keys[i], self.structure[i], self.structure[i + 1])
            for i in range(n_enc)
        ]
        dec_structure = [self.z_dim] + self.structure[::-1]
        dec = [
            _dense_init(keys[n_enc + i], dec_structure[i], dec_structure[i + 1])
            for i in range(len(dec_structure) - 1)
        ]
        return {
            "enc": enc,
            "dec": dec,
            "mu": _dense_init(keys[-2], self.structure[-1], self.z_dim),
            "logvar": _dense_init(keys[-1], self.structure[-1], self.z_dim),
        }

    def encode(self, params, x):
        h = x
        for layer in params["enc"]:
            h = self.act(h @ layer["w"] + layer["b"])
        mu = h @ params["mu"]["w"] + params["mu"]["b"]
        logvar = h @ params["logvar"]["w"] + params["logvar"]["b"]
        return mu, logvar

    def decode(self, params, z):
        h = z
        for i, layer in enumerate(params["dec"]):
            h = h @ layer["w"] + layer["b"]
            if i != len(params["dec"]) - 1:
                h = self.act(h)
        if self.likelihood == "mult":
            return jax.nn.softmax(h, axis=-1)
        return jax.nn.sigmoid(h)

    def loss(self, params, batch, rng):
        x = batch["rows"]
        mu, logvar = self.encode(params, x)
        std = jnp.exp(0.5 * logvar)
        z = mu + std * jax.random.normal(rng, mu.shape)
        x_ = self.decode(params, z)
        if self.likelihood == "mult":
            ll = x * jnp.log(x_ + EPS)
        elif self.likelihood == "bern":
            ll = x * jnp.log(x_ + EPS) + (1 - x) * jnp.log1p(-x_ + EPS)
        elif self.likelihood == "gaus":
            ll = -((x - x_) ** 2)
        elif self.likelihood == "pois":
            ll = x * jnp.log(x_ + EPS) - x_
        else:
            raise ValueError(f"Unknown likelihood {self.likelihood}")
        ll = jnp.sum(ll, axis=1)
        kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
        return jnp.mean(self.beta * kld - ll)

    def _reconstruct(self, params, users):
        assert self.user_rows is not None, "VAECF needs artifacts['user_rows'] to score"
        mu, _ = self.encode(params, self.user_rows[users])
        return self.decode(params, mu)

    def score_candidates(self, params, users, cand_items):
        recon = self._reconstruct(params, users)
        return jnp.take_along_axis(recon, cand_items, axis=1)

    def score_all(self, params, users):
        return self._reconstruct(params, users)
