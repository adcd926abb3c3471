"""QQQ checkpoint-format interop (formats/qqq_compat.py): pack/unpack
round-trip for both grouped and channel-only layouts, and byte-parity of
the packed tensors against an independent re-execution of the reference's
pack recipe (gptqmodel/nn_modules/qlinear/qqq.py:269-345)."""

import numpy as np
import pytest

from ganq_tpu.formats.qqq_compat import pack_qqq, unpack_qqq


def _mk(rng, out=32, kin=64, G=4):
    q4 = rng.integers(0, 16, size=(out, kin)).astype(np.int64)
    gs = rng.uniform(0.01, 0.2, size=(out, G)).astype(np.float32)
    se = rng.uniform(0.05, 0.5, size=(out,)).astype(np.float32)
    return q4, gs, se


def test_roundtrip_grouped(rng):
    q4, gs, se = _mk(rng)
    t = pack_qqq(q4, gs, se)
    assert t["B"].shape == (64 // 16, 32 * 16 // 8)
    assert t["s_group"].shape == (4, 32) and t["s_group"].dtype == np.float16
    assert t["s_channel"].shape == (1, 32)
    q4b, gsb, seb = unpack_qqq(t)
    np.testing.assert_array_equal(q4b, q4)
    np.testing.assert_allclose(seb, se, rtol=1e-6)
    # absolute group scales reconstructed through the fp16 relative store
    np.testing.assert_allclose(gsb, gs, rtol=2e-3)


def test_roundtrip_channel_only(rng):
    out, kin = 32, 64
    q4 = rng.integers(-8, 8, size=(out, kin)).astype(np.int64)
    se = rng.uniform(0.05, 0.5, size=(out,)).astype(np.float32)
    t = pack_qqq(q4, None, se)
    assert t["s_group"].size == 0
    q4b, gsb, seb = unpack_qqq(t)
    assert gsb is None
    np.testing.assert_array_equal(q4b, q4)
    np.testing.assert_allclose(seb, se, rtol=1e-6)


def test_pack_matches_reference_recipe(rng):
    """Independently re-execute the reference's exact pack math (torch
    version of qqq.py:269-345) and demand byte equality on B/s_group/
    s_channel for the grouped case."""
    torch = pytest.importorskip("torch")

    out, kin, G = 32, 64, 4
    gs_size = kin // G
    q4, gsc, se = _mk(rng, out, kin, G)
    ours = pack_qqq(q4, gsc, se)

    # ---- reference recipe (fake-quant weight -> B, s_group, s_channel)
    # build the fp16 weight this code path would have seen
    g_of_k = np.arange(kin) // gs_size
    W = (q4 - 8).astype(np.float32) * gsc[:, g_of_k]      # [out, in]
    maxq = 15
    s = torch.tensor(gsc.T)                               # [G, out]
    w = torch.tensor(W.T)                                 # [in, out]
    w = w.reshape((-1, gs_size, out)).permute(1, 0, 2).reshape((gs_size, -1))
    s_b = s.reshape((1, -1))
    w = torch.round(w / s_b).int()
    w += (maxq + 1) // 2
    w = torch.clamp(w, 0, maxq)
    s_extra = torch.tensor(se).reshape(1, -1).to(torch.float32)
    s = (s.reshape(-1, out) / s_extra).to(dtype=torch.float16)
    w = w.reshape((gs_size, -1, out)).permute(1, 0, 2)
    w = w.reshape((kin, out)).contiguous()

    # perms (qqq.py:178-207)
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (4 * (i % 4), 4 * (i % 4) + 1,
                        4 * (i % 4) + 2, 4 * (i % 4) + 3):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.array(perm)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    perm = torch.from_numpy(perm.reshape((-1, 8))[:, interleave].ravel())
    scale_perm = [i + 8 * j for i in range(8) for j in range(8)]
    scale_perm_single = [2 * i + j for i in range(4)
                         for j in (0, 1, 8, 9, 16, 17, 24, 25)]

    s = s.reshape((-1, len(scale_perm)))[:, scale_perm]
    s_extra = s_extra.reshape((-1, len(scale_perm_single)))[
        :, scale_perm_single].reshape((-1, out)).contiguous()
    s = s.reshape((-1, out)).contiguous()
    w = w.reshape((kin // 16, 16, out // 16, 16)).permute((0, 2, 1, 3))
    w = w.reshape((kin // 16, out * 16))
    res = w.reshape((-1, perm.numel()))[:, perm].reshape(w.shape)
    q = np.zeros((res.shape[0], res.shape[1] // 8), dtype=np.uint32)
    res = res.cpu().numpy().astype(np.uint32)
    for i in range(8):
        q |= res[:, i::8] << (4 * i)
    B_ref = q.astype(np.int32)

    np.testing.assert_array_equal(ours["B"], B_ref)
    np.testing.assert_array_equal(ours["s_group"], s.numpy())
    np.testing.assert_allclose(ours["s_channel"], s_extra.numpy(), rtol=1e-7)
