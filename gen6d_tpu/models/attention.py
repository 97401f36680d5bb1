"""Multi-head attention over the reference-view axis (channel-last Flax port of
reference network/attention.py).

Layout: features are (b, n, f) (views on axis 1, channels last). The torch
original reshapes (b, d, n) -> (b, d//h, h, n), i.e. the *head axis is the
fastest-varying* sub-axis of the channel dim — replicated here by reshaping
(b, n, d) -> (b, n, d//h, h).
"""
import flax.linen as nn
import jax.numpy as jnp


def attention(query, key, value, key_mask=None, temperature=1.0):
    """query: (b,n,d,h); key/value: (b,m,d,h); key_mask: (b,m) -> ((b,n,d_v,h), prob).

    Matches attention (network/attention.py:4-17): scores scaled by
    temperature then sqrt(d) where d is the per-head dim.
    """
    dim = query.shape[2]
    scores = jnp.einsum('bndh,bmdh->bhnm', query / temperature, key) / dim ** 0.5
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :] == 0, -1e7, scores)
    prob = nn.softmax(scores, axis=-1)
    out = jnp.einsum('bhnm,bmdh->bndh', prob, value)
    return out, prob


class AttentionBlock(nn.Module):
    """Matches AttentionBlock (network/attention.py:28-69); Conv1d(k=1) == Dense."""
    in_dim: int
    att_dim: int
    out_dim: int
    head_num: int = 4
    temperature: float = 1.0
    use_bias: bool = True
    skip_connect: bool = True
    norm: str = 'layer'

    @nn.compact
    def __call__(self, feats_query, feats_key, key_mask=None):
        """feats_query: (b,n0,f); feats_key: (b,n1,f) -> (b,n0,out_dim)."""
        b, n0, _ = feats_query.shape
        n1 = feats_key.shape[1]
        had = self.att_dim // self.head_num
        hod = self.out_dim // self.head_num

        q = nn.Dense(self.att_dim, use_bias=self.use_bias, name='conv_query')(feats_query)
        k = nn.Dense(self.att_dim, use_bias=self.use_bias, name='conv_key')(feats_key)
        v = nn.Dense(self.out_dim, use_bias=self.use_bias, name='conv_feats')(feats_key)
        q = q.reshape(b, n0, had, self.head_num)
        k = k.reshape(b, n1, had, self.head_num)
        v = v.reshape(b, n1, hod, self.head_num)
        out, _ = attention(q, k, v, key_mask, self.temperature)
        out = out.reshape(b, n0, self.out_dim)
        out = nn.Dense(self.out_dim, use_bias=self.use_bias, name='conv_merge')(out)
        if self.skip_connect:
            out = out + feats_query
        if self.norm == 'layer':
            out = nn.LayerNorm(name='norm')(out)
        else:
            from gen6d_tpu.models.layers import instance_norm
            out = instance_norm(out, spatial_axes=(1,))
        return out
