"""BiGRU parity vs torch pack_padded_sequence + nn.GRU (packed semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from creamfl_tpu.models.gru import BiGRU, gather_last_valid


def _port_torch_weights(params, tgru):
    """Copy torch GRU weights into our param dict (transposed layout)."""
    p = dict(params)
    p["fwd_wi"] = jnp.asarray(tgru.weight_ih_l0.detach().numpy().T)
    p["fwd_wh"] = jnp.asarray(tgru.weight_hh_l0.detach().numpy().T)
    p["fwd_bi"] = jnp.asarray(tgru.bias_ih_l0.detach().numpy())
    p["fwd_bh"] = jnp.asarray(tgru.bias_hh_l0.detach().numpy())
    p["bwd_wi"] = jnp.asarray(tgru.weight_ih_l0_reverse.detach().numpy().T)
    p["bwd_wh"] = jnp.asarray(tgru.weight_hh_l0_reverse.detach().numpy().T)
    p["bwd_bi"] = jnp.asarray(tgru.bias_ih_l0_reverse.detach().numpy())
    p["bwd_bh"] = jnp.asarray(tgru.bias_hh_l0_reverse.detach().numpy())
    return p


def test_bigru_matches_torch_packed(rng, key):
    b, l, d, h = 5, 11, 8, 6
    x = rng.normal(size=(b, l, d)).astype(np.float32)
    lengths = np.array([11, 7, 7, 3, 1])

    torch.manual_seed(0)
    tgru = torch.nn.GRU(d, h, bidirectional=True, batch_first=True)
    packed = pack_padded_sequence(torch.tensor(x), torch.tensor(lengths),
                                  batch_first=True)
    t_out, _ = tgru(packed)
    t_padded, _ = pad_packed_sequence(t_out, batch_first=True,
                                      total_length=l)
    t_padded = t_padded.detach().numpy()  # [B, L, 2H], zeros at pads

    model = BiGRU(hidden_size=h)
    variables = model.init(key, jnp.asarray(x), jnp.asarray(lengths))
    params = _port_torch_weights(variables["params"], tgru)
    outs, final = model.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(outs), t_padded, rtol=1e-4,
                               atol=1e-5)

    # Final state equals the reference's gather of out[:, len-1].
    expected_final = t_padded[np.arange(b), lengths - 1]
    np.testing.assert_allclose(np.asarray(final), expected_final, rtol=1e-4,
                               atol=1e-5)


def test_gather_last_valid():
    outs = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    lengths = jnp.asarray([4, 2])
    got = np.asarray(gather_last_valid(outs, lengths))
    np.testing.assert_array_equal(got[0], np.asarray(outs)[0, 3])
    np.testing.assert_array_equal(got[1], np.asarray(outs)[1, 1])
