"""Trained retrieval path: RetrievalHead projection parity vs a torch
transcription of must3r RetrievalModel, ASMK★ similarity sanity, and the
retrieval-checkpoint port entry (reference engine/retrieval.py:14-48)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from panst3r_tpu.engine.retrieval import (RetrievalHead, asmk_similarity,
                                          select_keyframes_retrieval)


def _torch_model(D=32, Dp=16, hdims=(24, 16), residual=False, seed=0):
    """Transcription of must3r RetrievalModel's projection stack
    (prewhiten Linear → GELU-MLP projector → postwhiten Linear → L2)."""
    g = torch.Generator().manual_seed(seed)
    m = torch.nn.ModuleDict({
        "prewhiten": torch.nn.Linear(D, D),
        "projector": torch.nn.Sequential(
            torch.nn.Linear(D, hdims[0]), torch.nn.GELU(),
            torch.nn.Linear(hdims[0], hdims[1])),
        "postwhiten": torch.nn.Linear(hdims[1], Dp),
    })
    for p in m.parameters():
        torch.nn.init.normal_(p, 0.0, 0.3, generator=g)
    return m


def _reference_forward(m, x):
    h = m["prewhiten"](x)
    h = m["projector"](h)
    h = m["postwhiten"](h)
    return torch.nn.functional.normalize(h, dim=-1)


def _head_from_torch(m, codebook=None):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from port_torch_checkpoint import port_retrieval_checkpoint

    ckpt = {"model": sd, "asmk_codebook": codebook,
            "asmk_params": {"similarity": {"alpha": 3.0,
                                           "similarity_threshold": 0.0}}}
    return RetrievalHead(**port_retrieval_checkpoint(ckpt))


def test_projection_matches_torch(rng):
    m = _torch_model()
    head = _head_from_torch(m)
    x = rng.standard_normal((2, 50, 32)).astype(np.float32)
    ours, w = head.project(jnp.asarray(x))
    ref = _reference_forward(m, torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), np.linalg.norm(x, axis=-1),
                               rtol=1e-5)


def test_port_rejects_unmapped_keys():
    m = _torch_model()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from port_torch_checkpoint import port_retrieval_checkpoint

    with pytest.raises(ValueError, match="unmapped"):
        port_retrieval_checkpoint({"model": sd})


def test_asmk_similarity_separates_scene_clusters(rng):
    """Views sharing visual words must score higher than unrelated views;
    self-similarity is maximal and the matrix is symmetric."""
    D, K = 16, 64
    codebook = rng.standard_normal((K, D)).astype(np.float32)
    head = RetrievalHead(codebook=codebook, alpha=3.0)
    # Two groups of views drawn around disjoint centroid subsets.
    def views(word_ids, n_views=3, n_tok=40):
        out = []
        for _ in range(n_views):
            words = rng.choice(word_ids, n_tok)
            out.append(codebook[words] +
                       rng.standard_normal((n_tok, D)) * 0.05)
        return out
    ga = views(np.arange(0, 8))
    gb = views(np.arange(32, 40))
    tokens = jnp.asarray(np.stack(ga + gb), jnp.float32)
    sim = asmk_similarity(head, tokens)
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    within_a = sim[:3, :3][np.triu_indices(3, 1)].mean()
    within_b = sim[3:, 3:][np.triu_indices(3, 1)].mean()
    across = sim[:3, 3:].mean()
    assert within_a > across + 0.05 and within_b > across + 0.05


def test_select_keyframes_with_head_covers_clusters(rng):
    D, K = 16, 64
    codebook = rng.standard_normal((K, D)).astype(np.float32)
    head = RetrievalHead(codebook=codebook)
    def view(word_ids, n_tok=40):
        words = rng.choice(word_ids, n_tok)
        return codebook[words] + rng.standard_normal((n_tok, D)) * 0.05
    # 3 clusters × 2 views: picking 3 keyframes must hit all clusters.
    tokens = jnp.asarray(np.stack([
        view(np.arange(0, 8)), view(np.arange(0, 8)),
        view(np.arange(16, 24)), view(np.arange(16, 24)),
        view(np.arange(40, 48)), view(np.arange(40, 48))]), jnp.float32)
    kf = select_keyframes_retrieval(tokens, 3, head=head)
    assert len(set(kf)) == 3
    clusters = {i // 2 for i in kf}
    assert clusters == {0, 1, 2}


def test_device_keyframe_selection_matches_host(rng):
    """Jittable serve-wire keyframe selection == the host numpy path."""
    import jax
    import jax.numpy as jnp

    from panst3r_tpu.engine.retrieval import (
        select_keyframes_retrieval, select_keyframes_retrieval_device)

    for V, K in [(8, 4), (12, 6), (5, 5), (16, 3)]:
        tokens = jnp.asarray(rng.standard_normal((V, 20, 16)), jnp.float32)
        host = select_keyframes_retrieval(tokens, K)
        dev = jax.jit(select_keyframes_retrieval_device,
                      static_argnums=1)(tokens, K)
        assert np.asarray(dev).tolist() == list(host), (V, K)
