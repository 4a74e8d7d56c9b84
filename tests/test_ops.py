"""Golden kernel tests ported from the reference's unit suite.

Cases mirror ``mDeepFRI/tests/test_contact_map_utils.py`` and
``tests/test_predict.py`` semantics (SURVEY.md §4: "the golden tests to port
as JAX-kernel parity tests").
"""

import numpy as np
import pytest

import jax.numpy as jnp

from metagenomic_deepfri_tpu.ops.cmap_align import (align_contact_map,
                                                    batched_align_contact_maps,
                                                    build_projection_arrays)
from metagenomic_deepfri_tpu.ops.contact import (batched_contact_maps,
                                                 calculate_contact_map,
                                                 pairwise_sqeuclidean)
from metagenomic_deepfri_tpu.ops.one_hot import (ALPHABET, batch_tokens,
                                                 seq2onehot, seq2tokens,
                                                 tokens2onehot)


class TestSeqEncoding:
    def test_alphabet_exact(self):
        # bit-compat contract with DeepFRI weights (ref predict.pyx:32)
        assert ALPHABET == "-DGULNTKHYWCPVSOIEFXQABZRM"

    def test_onehot_shape_and_placement(self):
        oh = seq2onehot("MKV")
        assert oh.shape == (3, 26)
        assert oh.dtype == np.float32
        assert oh.sum() == 3
        assert oh[0, ALPHABET.index("M")] == 1
        assert oh[1, ALPHABET.index("K")] == 1
        assert oh[2, ALPHABET.index("V")] == 1

    def test_invalid_char_raises(self):
        with pytest.raises(ValueError, match="Invalid character"):
            seq2onehot("MK1")

    def test_device_onehot_matches_host(self):
        seq = "MKVDGULNTKHYWCPVSOIEFXQABZRM"
        host = seq2onehot(seq)
        dev = tokens2onehot(jnp.asarray(seq2tokens(seq)))
        np.testing.assert_array_equal(np.asarray(dev), host)

    def test_batch_tokens_padding(self):
        toks, lens = batch_tokens(["MK", "MKVD"], pad_to=8)
        assert toks.shape == (2, 8)
        np.testing.assert_array_equal(lens, [2, 4])
        assert (toks[0, 2:] == 0).all()


class TestPairwiseSqeuclidean:
    def test_small_matrix(self):
        # same fixture as reference tests/test_contact_map_utils.py:16-25
        np.random.seed(42)
        matrix = np.random.rand(3, 3).astype(np.float32)
        result = pairwise_sqeuclidean(matrix)
        expected = np.zeros((3, 3), dtype=np.float32)
        for i in range(3):
            for j in range(3):
                expected[i, j] = np.sum((matrix[i] - matrix[j]) ** 2)
        np.testing.assert_allclose(result, expected, atol=1e-6)
        assert (np.diag(result) == 0).all()

    def test_batched_device_matches_host(self):
        rng = np.random.default_rng(0)
        coords = rng.normal(size=(2, 16, 3)).astype(np.float32) * 10
        lengths = np.array([16, 10], dtype=np.int32)
        thr = 6.0
        dev = np.asarray(batched_contact_maps(jnp.asarray(coords),
                                              jnp.asarray(lengths), thr))
        for b in range(2):
            n = lengths[b]
            host = calculate_contact_map(coords[b, :n], threshold=thr)
            np.testing.assert_array_equal(dev[b, :n, :n], host)
            # padded region zero
            assert dev[b, n:, :].sum() == 0
            assert dev[b, :, n:].sum() == 0

    def test_sparse_mode(self):
        coords = np.array([[0, 0, 0], [1, 0, 0], [100, 0, 0]], dtype=np.float32)
        sparse = calculate_contact_map(coords, threshold=6.0, mode="sparse")
        pairs = {tuple(r) for r in sparse.tolist()}
        assert (0, 1) in pairs and (1, 0) in pairs
        assert (0, 2) not in pairs
        assert (0, 0) in pairs  # self-contacts present (distance 0)


class TestAlignContactMap:
    # ported from reference tests/test_contact_map_utils.py:28-110

    def test_identity_alignment(self):
        result = align_contact_map("AB", "AB",
                                   np.array([[0, 1]], dtype=np.int32))
        np.testing.assert_array_equal(result,
                                      np.array([[1, 1], [1, 1]], np.int32))

    def test_gap_in_query_deletion(self):
        result = align_contact_map(
            "A-C", "ABC",
            np.array([[0, 1], [1, 2], [0, 2]], dtype=np.int32))
        np.testing.assert_array_equal(result,
                                      np.array([[1, 1], [1, 1]], np.int32))

    def test_gap_in_target_insertion(self):
        result = align_contact_map("ABC", "A-C",
                                   np.array([[0, 1]], dtype=np.int32),
                                   generated_contacts=1)
        np.testing.assert_array_equal(result, np.ones((3, 3), np.int32))

    def test_large_input_stress(self):
        N = 100
        contacts = np.array([[i, i + 1] for i in range(N - 1)], dtype=np.int32)
        result = align_contact_map("A" * N, "A" * N, contacts)
        assert result.shape == (N, N)
        assert result[0, 1] == 1

    def test_single_direction_input_symmetrised(self):
        result = align_contact_map("ABCD", "ABCD",
                                   np.array([[0, 2]], dtype=np.int32),
                                   generated_contacts=0)
        assert result[0, 2] == 1
        assert result[2, 0] == 1


class TestBatchedAlignContactMaps:
    def _device_single(self, q_aln, t_aln, t_coords, gen=2, thr=6.0,
                       pad_q=16, pad_t=16):
        q_to_t, ins, qlen = build_projection_arrays(q_aln, t_aln, pad_q, pad_t)
        tlen = t_coords.shape[0]
        coords_pad = np.zeros((1, pad_t, 3), np.float32)
        coords_pad[0, :tlen] = t_coords
        # place padded coords far away so they generate no contacts
        coords_pad[0, tlen:] = 1e6
        tc = batched_contact_maps(jnp.asarray(coords_pad),
                                  jnp.asarray(np.array([tlen], np.int32)), thr)
        out = batched_align_contact_maps(
            tc, jnp.asarray(q_to_t[None]), jnp.asarray(ins[None]),
            jnp.asarray(np.array([qlen], np.int32)), generated_contacts=gen)
        return np.asarray(out)[0, :qlen, :qlen].astype(np.int32), qlen

    def _host_single(self, q_aln, t_aln, t_coords, gen=2, thr=6.0):
        sparse = calculate_contact_map(t_coords, threshold=thr, mode="sparse")
        return align_contact_map(q_aln, t_aln, sparse, generated_contacts=gen)

    @pytest.mark.parametrize("q_aln,t_aln", [
        ("ABCDE", "ABCDE"),
        ("AB-DE", "ABCDE"),
        ("ABCDE", "AB-DE"),
        ("A-CDE", "ABC-E"),
    ])
    def test_matches_host_kernel(self, q_aln, t_aln):
        rng = np.random.default_rng(7)
        tlen = sum(1 for c in t_aln if c != "-")
        coords = rng.normal(size=(tlen, 3)).astype(np.float32) * 4
        dev, qlen = self._device_single(q_aln, t_aln, coords)
        host = self._host_single(q_aln, t_aln, coords)
        assert host.shape == (qlen, qlen)
        np.testing.assert_array_equal(dev, host)


class TestAlignedContactsFromCoords:
    """The fused gather-coords-then-threshold path must be bit-identical to
    the reference-parity scatter (``align_contact_map``)."""

    def _run(self, q_aln, t_aln, coords, gen=2, thr=6.0, pad_q=16):
        from metagenomic_deepfri_tpu.ops.cmap_align import (
            aligned_contacts_from_coords, project_alignment_coords)

        proj, ins, qlen = project_alignment_coords(q_aln, t_aln, coords)
        proj_pad = np.zeros((1, pad_q, 3), np.float32)
        proj_pad[0, :qlen] = proj
        ins_pad = np.zeros((1, pad_q), bool)
        ins_pad[0, :qlen] = ins
        out = aligned_contacts_from_coords(
            jnp.asarray(proj_pad), jnp.asarray(ins_pad),
            jnp.asarray(np.array([qlen], np.int32)),
            threshold=thr, generated_contacts=gen)
        full = np.asarray(out)[0]
        # padding must stay zero
        assert full[qlen:].sum() == 0 and full[:, qlen:].sum() == 0
        return full[:qlen, :qlen].astype(np.int32)

    @pytest.mark.parametrize("q_aln,t_aln", [
        ("ABCDE", "ABCDE"),
        ("AB-DE", "ABCDE"),
        ("ABCDE", "AB-DE"),
        ("A-CDE", "ABC-E"),
        ("AB--E", "ABCDE"),
        ("--CDE", "ABCDE"),
    ])
    def test_matches_reference_scatter(self, q_aln, t_aln):
        rng = np.random.default_rng(11)
        tlen = sum(1 for c in t_aln if c != "-")
        coords = rng.normal(size=(tlen, 3)).astype(np.float32) * 4
        sparse = calculate_contact_map(coords, threshold=6.0, mode="sparse")
        host = align_contact_map(q_aln, t_aln, sparse, generated_contacts=2)
        dev = self._run(q_aln, t_aln, coords)
        np.testing.assert_array_equal(dev, host)

    def test_random_large(self):
        rng = np.random.default_rng(3)
        for trial in range(5):
            tlen = int(rng.integers(30, 120))
            steps = rng.normal(size=(tlen, 3)).astype(np.float32)
            steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
            coords = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
            # random alignment with gaps on both sides
            q_chars, t_chars = [], []
            t_used = 0
            while t_used < tlen:
                r = rng.random()
                if r < 0.1:
                    q_chars.append("-"); t_chars.append("A"); t_used += 1
                elif r < 0.2:
                    q_chars.append("A"); t_chars.append("-")
                else:
                    q_chars.append("A"); t_chars.append("A"); t_used += 1
            q_aln, t_aln = "".join(q_chars), "".join(t_chars)
            sparse = calculate_contact_map(coords, threshold=6.0,
                                           mode="sparse")
            host = align_contact_map(q_aln, t_aln, sparse,
                                     generated_contacts=2)
            qlen = host.shape[0]
            dev = self._run(q_aln, t_aln, coords,
                            pad_q=int(np.ceil(max(qlen, 1) / 8) * 8))
            np.testing.assert_array_equal(dev, host)
