"""RNN cell/scan parity against torch cuDNN-layout modules."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from image_captioning_through_rl_tpu.ops import rnn as rnn_ops

PREC = "highest"


def _lstm_params_from_torch(lstm: nn.LSTM, reverse=False):
    sfx = "_reverse" if reverse else ""
    sd = lstm.state_dict()
    return {
        "wi": jnp.asarray(sd[f"weight_ih_l0{sfx}"].numpy().T),
        "wh": jnp.asarray(sd[f"weight_hh_l0{sfx}"].numpy().T),
        "b": jnp.asarray((sd[f"bias_ih_l0{sfx}"] + sd[f"bias_hh_l0{sfx}"]).numpy()),
    }


def _gru_params_from_torch(gru: nn.GRU):
    sd = gru.state_dict()
    return {
        "wi": jnp.asarray(sd["weight_ih_l0"].numpy().T),
        "wh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
        "bi": jnp.asarray(sd["bias_ih_l0"].numpy()),
        "bh": jnp.asarray(sd["bias_hh_l0"].numpy()),
    }


def test_lstm_scan_matches_torch(rng_np):
    T, N, E, H = 7, 5, 12, 16
    lstm = nn.LSTM(E, H)
    xs = rng_np.standard_normal((T, N, E), dtype=np.float32)
    h0 = rng_np.standard_normal((N, H), dtype=np.float32)
    with torch.no_grad():
        out_t, (hT, cT) = lstm(
            torch.from_numpy(xs),
            (torch.from_numpy(h0[None]), torch.zeros(1, N, H)),
        )
    params = _lstm_params_from_torch(lstm)
    hs, (hj, cj) = rnn_ops.lstm_scan(
        params, jnp.asarray(xs), (jnp.asarray(h0), jnp.zeros((N, H))), precision=PREC
    )
    np.testing.assert_allclose(np.asarray(hs), out_t.numpy(), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(hj), hT[0].numpy(), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(cj), cT[0].numpy(), rtol=2e-4, atol=5e-5)


def test_gru_scan_matches_torch(rng_np):
    T, N, E, H = 6, 4, 10, 14
    gru = nn.GRU(E, H)
    xs = rng_np.standard_normal((T, N, E), dtype=np.float32)
    with torch.no_grad():
        out_t, hT = gru(torch.from_numpy(xs))
    params = _gru_params_from_torch(gru)
    hs, hj = rnn_ops.gru_scan(params, jnp.asarray(xs), jnp.zeros((N, H)), precision=PREC)
    np.testing.assert_allclose(np.asarray(hs), out_t.numpy(), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(hj), hT[0].numpy(), rtol=2e-4, atol=5e-5)


def test_bilstm_scan_matches_torch(rng_np):
    T, N, E, H = 5, 3, 8, 12
    lstm = nn.LSTM(E, H, bidirectional=True)
    xs = rng_np.standard_normal((T, N, E), dtype=np.float32)
    h0 = rng_np.standard_normal((2, N, H), dtype=np.float32)
    with torch.no_grad():
        out_t, _ = lstm(torch.from_numpy(xs), (torch.from_numpy(h0), torch.zeros(2, N, H)))
    fwd = _lstm_params_from_torch(lstm)
    bwd = _lstm_params_from_torch(lstm, reverse=True)
    zeros = jnp.zeros((N, H))
    hs, _ = rnn_ops.bilstm_scan(
        fwd, bwd, jnp.asarray(xs),
        (jnp.asarray(h0[0]), zeros), (jnp.asarray(h0[1]), zeros),
        precision=PREC,
    )
    np.testing.assert_allclose(np.asarray(hs), out_t.numpy(), rtol=2e-4, atol=5e-5)


def test_flat_stream_scan_matches_batch_as_time_lstm(rng_np):
    """The compat scan must equal torch's per-column batch-as-time loop."""
    N, T, E, H = 4, 5, 8, 10
    lstm = nn.LSTM(E, H)
    emb = rng_np.standard_normal((N, T, E), dtype=np.float32)
    hidden = (torch.zeros(1, 1, H), torch.zeros(1, 1, H))
    with torch.no_grad():
        for t in range(T):
            out_t, hidden = lstm(torch.from_numpy(emb[:, t]).view(N, 1, E), hidden)
    params = _lstm_params_from_torch(lstm)
    stream = jnp.asarray(emb).transpose(1, 0, 2).reshape(N * T, E)  # column-major
    outs, final = rnn_ops.flat_stream_scan(
        "lstm", params, stream, (jnp.zeros(H), jnp.zeros(H)), precision=PREC
    )
    np.testing.assert_allclose(
        np.asarray(outs[-N:]), out_t.squeeze(1).numpy(), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(final[0]), hidden[0].squeeze().numpy(), rtol=2e-4, atol=5e-5
    )
