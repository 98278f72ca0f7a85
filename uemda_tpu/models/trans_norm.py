"""TransNorm: two-domain batch normalization with adaptive channel alphas.

Rebuild of ``uemda/trans_norm.py:8-230`` (dormant in the reference — kept for
API parity): in training the batch is the concatenation [source; target];
each half is normalized with its own running statistics but shared
gamma/beta, then scaled by (1 + alpha) where alpha is a channel-attention
derived from the distance between the domains' normalized means. Eval
normalizes with the TARGET statistics.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class TransNorm2d(nn.Module):
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.num_features
        scale = self.param("scale", nn.initializers.uniform(1.0), (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        init_mean = lambda *_: jnp.zeros((c,))
        init_var = lambda *_: jnp.ones((c,))
        rm_s = self.variable("batch_stats", "mean_source", init_mean)
        rm_t = self.variable("batch_stats", "mean_target", init_mean)
        rv_s = self.variable("batch_stats", "var_source", init_var)
        rv_t = self.variable("batch_stats", "var_target", init_var)

        def bn(h, mean, var):
            return (h - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias

        if not train:
            z = bn(x, rm_t.value, rv_t.value)
            dis = jnp.abs(
                rm_s.value * jax.lax.rsqrt(rv_s.value + self.eps)
                - rm_t.value * jax.lax.rsqrt(rv_t.value + self.eps)
            )
            prob = 1.0 / (1.0 + dis)
            alpha = c * prob / prob.sum()
            return z * (1.0 + alpha)

        b = x.shape[0] // 2
        xs, xt = x[:b], x[b:]

        def stats(h):
            flat = h.reshape(-1, c).astype(jnp.float32)
            m = flat.mean(axis=0)
            # torch F.batch_norm normalizes with biased var, tracks unbiased
            v_b = flat.var(axis=0)
            n = flat.shape[0]
            v_u = v_b * n / max(n - 1, 1)
            return m, v_b, v_u

        ms, vbs, vus = stats(xs)
        mt, vbt, vut = stats(xt)
        zs = bn(xs, ms, vbs)
        zt = bn(xt, mt, vbt)
        z = jnp.concatenate([zs, zt], axis=0)

        if not self.is_initializing():
            m = self.momentum
            rm_s.value = (1 - m) * rm_s.value + m * ms
            rv_s.value = (1 - m) * rv_s.value + m * vus
            rm_t.value = (1 - m) * rm_t.value + m * mt
            rv_t.value = (1 - m) * rv_t.value + m * vut

        # the reference's alpha distance uses UNBIASED batch variance
        # (trans_norm.py:193-201: torch.var default), while normalization
        # itself uses the biased variance inside F.batch_norm
        dis = jnp.abs(
            ms * jax.lax.rsqrt(vus + self.eps) - mt * jax.lax.rsqrt(vut + self.eps)
        )
        prob = 1.0 / (1.0 + dis)
        alpha = jax.lax.stop_gradient(c * prob / prob.sum())
        return z * (1.0 + alpha)
