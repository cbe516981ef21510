"""Interpret-mode parity tests for the fused decode kernels.

kernels/tokenize.py (fused static tokenizer) and kernels/expand2.py
(expansion v2) against their XLA formulations, zlib as the ultimate
oracle — the same dual-backend discipline as the reference's
MyHDL-sim/Icarus cosimulation (/root/reference/test_deflate.py:17-35).
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deflate.kernels.expand2 import expand_fused2
from tpu_deflate.kernels.tokenize import tokenize_static_batch
from tpu_deflate.ops.decode import TK_LIT, decode_rows_batch, tokenize

PW = 64 * 512  # small plane window so interpret mode stays fast


def _zfixed(payload: bytes) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    return co.compress(payload) + co.flush()


@pytest.fixture(scope="module")
def static_streams(rng):
    payloads = [
        b"hello world " * 50,
        bytes(rng.integers(65, 91, 700, dtype=np.uint8)) * 2,
        b"a" * 1000,
        b"",
        b"x",
        (b"ab" * 700),
    ]
    return [(p, _zfixed(p)) for p in payloads]


class TestTokenizeFused:
    def test_parity_vs_xla(self, static_streams):
        M = PW // 8 + 32
        B = len(static_streams)
        rows = np.zeros((B, M), np.uint8)
        ends = np.zeros((B,), np.int32)
        for i, (_p, s) in enumerate(static_streams):
            rows[i, : len(s)] = np.frombuffer(s, np.uint8)
            ends[i] = 8 * len(s)
        tok, ntok, out_total, end_pos, err = tokenize_static_batch(
            jnp.asarray(rows), jnp.asarray(ends), pw=PW, interpret=True
        )
        tok = np.asarray(tok)
        for i, (_p, s) in enumerate(static_streams):
            tk_r, ta_r, tb_r, tp_r, tot_r, pos_r, err_r = tokenize(
                jnp.asarray(rows[i]), 0, tok_cap=4096, end_bit=int(ends[i]),
                pwin=PW, stop_at_eob=True, static_only=True,
            )
            tp_r = int(tp_r)
            assert int(ntok[i]) == tp_r
            assert int(out_total[i]) == int(tot_r)
            assert int(err[i]) == int(err_r)
            assert int(end_pos[i]) == int(pos_r)
            if tp_r:
                tk_f = (tok[i] >> 26) & 3
                ta_f = (tok[i] >> 17) & 0x1FF
                tb_f = tok[i] & 0x1FFFF
                np.testing.assert_array_equal(tk_f[:tp_r], np.asarray(tk_r)[:tp_r])
                np.testing.assert_array_equal(ta_f[:tp_r], np.asarray(ta_r)[:tp_r])
                np.testing.assert_array_equal(tb_f[:tp_r], np.asarray(tb_r)[:tp_r])

    def test_stored_lane_errors_are_contained(self, rng):
        # a stored block is not the kernel's job (the decode_rows_batch
        # cond routes it to XLA); here we just confirm the kernel flags
        # or ignores it without crashing
        p = bytes(rng.integers(0, 256, 600, dtype=np.uint8))
        s = _zfixed(p)
        assert (s[0] >> 1) & 3 == 0  # stored
        rows = np.zeros((2, PW // 8 + 32), np.uint8)
        rows[0, : len(s)] = np.frombuffer(s, np.uint8)
        tok, ntok, tot, pos, err = tokenize_static_batch(
            jnp.asarray(rows), jnp.asarray(np.array([8 * len(s), 0], np.int32)),
            pw=PW, interpret=True,
        )
        assert int(err[1]) == 0 and int(ntok[1]) == 0  # empty lane clean


def _emulate(tks, tas, tbs):
    out = bytearray()
    for k, a, b in zip(tks, tas, tbs):
        if k == 0:
            out.append(a)
        else:
            for _ in range(a):
                out.append(out[-b])
    return bytes(out)


class TestExpandFused2:
    def _run(self, tks, tas, tbs, out_cap, max_dist=2048):
        tp = len(tks)
        K = ((tp + 127) // 128 + 1) * 128
        tk = np.zeros((1, K), np.int32)
        ta = np.zeros((1, K), np.int32)
        tb = np.zeros((1, K), np.int32)
        tk[0, :tp] = tks
        ta[0, :tp] = tas
        tb[0, :tp] = tbs
        live = np.arange(K) < tp
        out_len = np.where(live, np.where(tk[0] == 0, 1, ta[0]), 0)
        off = (np.cumsum(out_len) - out_len).astype(np.int32)[None]
        total = np.array([out_len.sum()], np.int32)
        c1 = ((tk & 3) << 9) | (ta & 0x1FF)
        out = expand_fused2(
            jnp.asarray(off), jnp.asarray(c1), jnp.asarray(tb),
            jnp.asarray(np.array([tp], np.int32)), jnp.asarray(total),
            out_cap=out_cap, max_dist=max_dist, interpret=True,
        )
        return np.asarray(out)[0, : int(total[0])].astype(np.uint8).tobytes()

    @pytest.mark.parametrize(
        "name,tks,tas,tbs,cap",
        [
            ("literals", [0] * 100, list(range(1, 101)), [0] * 100, 2048),
            (
                "d1_run_crossing",
                [0] + [1] * 16, [65] + [258] * 16, [0] + [1] * 16, 6144,
            ),
            (
                "d2_run_crossing",
                [0, 0] + [1] * 16, [97, 98] + [258] * 16, [0, 0] + [2] * 16,
                6144,
            ),
            (
                "match_at_boundary",
                [0] * 2045 + [1, 1] + [0] * 5,
                [(i % 251) + 1 for i in range(2045)] + [10, 5, 1, 2, 3, 4, 5],
                [0] * 2045 + [7, 2000] + [0] * 5,
                4096,
            ),
            (
                "nested_overlaps",
                [0, 0, 0, 1, 1, 1, 1],
                [1, 2, 3, 5, 7, 11, 258],
                [0, 0, 0, 3, 5, 2, 13],
                2048,
            ),
        ],
    )
    def test_cases(self, name, tks, tas, tbs, cap):
        assert self._run(tks, tas, tbs, cap) == _emulate(tks, tas, tbs)

    def test_wide_window_variant(self, rng):
        # distances > 2048 need the max_dist=32768 variant
        tks = [0] * 4000 + [1] * 8
        tas = [int(x) for x in rng.integers(1, 255, 4000)] + [258] * 8
        tbs = [0] * 4000 + [3000, 3500, 2500, 4000, 3999, 2049, 2100, 2048]
        got = self._run(tks, tas, tbs, 8192, max_dist=32768)
        assert got == _emulate(tks, tas, tbs)

    def test_zlib_streams_roundtrip(self, rng, static_streams):
        for p, s in static_streams:
            if not p:
                continue
            row = np.zeros(len(s) + 64, np.uint8)
            row[: len(s)] = np.frombuffer(s, np.uint8)
            tk, ta, tb, tp, _t, _p2, err = tokenize(
                jnp.asarray(row), 0, tok_cap=4096, end_bit=8 * len(s),
                pwin=PW, stop_at_eob=True, static_only=True,
            )
            assert int(err) == 0
            tkn = np.asarray(tk)[None]
            if (tkn[0, : int(tp)] == 2).any():
                continue  # stored lanes take the XLA path in production
            tan = np.asarray(ta)[None]
            tbn = np.asarray(tb)[None]
            K = tkn.shape[1]
            live = np.arange(K) < int(tp)
            out_len = np.where(live, np.where(tkn[0] == 0, 1, tan[0]), 0)
            off = (np.cumsum(out_len) - out_len).astype(np.int32)[None]
            total = np.array([out_len.sum()], np.int32)
            c1 = ((tkn & 3) << 9) | (tan & 0x1FF)
            cap = ((len(p) + 2047) // 2048) * 2048 or 2048
            out = expand_fused2(
                jnp.asarray(off), jnp.asarray(c1), jnp.asarray(tbn),
                jnp.asarray(np.array([int(tp)], np.int32)),
                jnp.asarray(total), out_cap=cap, max_dist=32768,
                interpret=True,
            )
            got = np.asarray(out)[0, : len(p)].astype(np.uint8).tobytes()
            assert got == p


class TestTokenizeDynFused:
    """Parity of the fused dynamic tokenizer (kernels/tokenize_dyn.py)
    against the XLA tokenize, per lane, for dynamic- and static-tree
    blocks with per-lane comparison-decode tables."""

    CH = 3072

    @pytest.fixture(scope="class")
    def dyn_container(self, rng):
        import os

        from tpu_deflate.config import DeflateConfig
        from tpu_deflate.ops.encode import encode_blocks_batch

        # real prose/code: balanced trees whose min code length satisfies
        # the kernel gate (tiny/skewed payloads produce < 3-bit codes and
        # exercise the fallback lane instead)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        text = open(os.path.join(root, "SURVEY.md"), "rb").read() * 4
        payloads = [
            text[: self.CH],
            bytes(rng.integers(97, 123, self.CH, np.uint8)),  # letters
            bytes(rng.integers(0, 256, self.CH, np.uint8)),  # random->static/stored
            b"z" * self.CH,  # extreme skew -> min_len < 3 (fallback lane)
        ]
        data = b"".join(payloads)
        n = len(payloads)
        darr = jnp.asarray(
            np.frombuffer(data, np.uint8).reshape(n, self.CH)
        )
        finals = np.zeros(n, bool)
        finals[-1] = True
        cfg = DeflateConfig(
            window=256, max_match=10, chunk_size=self.CH, dynamic_encode=True
        )
        out, sizes, _ = encode_blocks_batch(
            darr, jnp.full(n, self.CH, jnp.int32), jnp.asarray(finals),
            config=cfg,
        )
        return payloads, np.asarray(out), np.asarray(sizes)

    def test_prep_static_lane_matches_static_params(self):
        from tpu_deflate.kernels.tokenize_dyn import TAB_LIT_LIM, TAB_LIT_RD
        from tpu_deflate.ops.decode import (
            _S_LIT_LIM,
            _S_LIT_RD,
            dyn_header_params_batch,
        )

        s = _zfixed(b"hello hello hello")
        rows = np.zeros((1, 1200), np.uint8)
        rows[0, : len(s)] = np.frombuffer(s, np.uint8)
        prep = dyn_header_params_batch(
            jnp.asarray(rows), jnp.asarray([8 * len(s)], np.int32)
        )
        assert int(prep["ok"][0]) == 1
        assert int(prep["start"][0]) == 3
        tab = np.asarray(prep["tab"])[0]
        np.testing.assert_array_equal(
            tab[TAB_LIT_LIM : TAB_LIT_LIM + 16], _S_LIT_LIM
        )
        np.testing.assert_array_equal(
            tab[TAB_LIT_RD : TAB_LIT_RD + 16], _S_LIT_RD
        )

    def test_parity_vs_xla(self, dyn_container):
        from tpu_deflate.kernels.tokenize_dyn import (
            MIN_LIT_LEN,
            tokenize_dyn_batch,
        )
        from tpu_deflate.ops.decode import (
            _fused_pw,
            chunk_pwin,
            dyn_header_params_batch,
        )

        payloads, rows, sizes = dyn_container
        ends = (8 * sizes).astype(np.int32)
        prep = dyn_header_params_batch(jnp.asarray(rows), jnp.asarray(ends))
        ok = np.asarray(prep["ok"])
        ml = np.asarray(prep["min_len"])
        gate = (ok == 1) & (ml >= MIN_LIT_LEN)
        assert gate.sum() >= 2  # the corpus must exercise the kernel
        pw = _fused_pw(self.CH)  # tokcap scales with pw: always use the
        # production window (a smaller pw under-sizes the token buffer)
        tok, ntok, tot, endp, err = tokenize_dyn_batch(
            jnp.asarray(rows), jnp.asarray(ends), prep["tab"], prep["start"],
            pw=pw, interpret=True,
        )
        tok = np.asarray(tok)
        for i in np.nonzero(gate)[0]:
            tk, ta, tb, tp, t2, pos, e2 = tokenize(
                jnp.asarray(rows[i]), 0, tok_cap=self.CH + 16,
                end_bit=int(ends[i]), pwin=chunk_pwin(self.CH),
                stop_at_eob=True, static_only=False,
            )
            tp = int(tp)
            assert int(err[i]) == int(e2)
            assert int(ntok[i]) == tp
            assert int(tot[i]) == int(t2)
            assert int(endp[i]) == int(pos)
            tk_f = (tok[i] >> 26) & 3
            ta_f = (tok[i] >> 17) & 0x1FF
            tb_f = tok[i] & 0x1FFFF
            np.testing.assert_array_equal(tk_f[:tp], np.asarray(tk)[:tp])
            np.testing.assert_array_equal(ta_f[:tp], np.asarray(ta)[:tp])
            np.testing.assert_array_equal(tb_f[:tp], np.asarray(tb)[:tp])

    def test_corrupt_dynamic_lane_errors(self, dyn_container):
        from tpu_deflate.kernels.tokenize_dyn import (
            MIN_LIT_LEN,
            tokenize_dyn_batch,
        )
        from tpu_deflate.ops.decode import _fused_pw, dyn_header_params_batch

        payloads, rows, sizes = dyn_container
        i = 0  # text lane: dynamic tree, gated in
        rows = rows.copy()
        # corrupt mid-block, well past the header
        rows[i, int(sizes[i]) // 2] ^= 0xA5
        ends = (8 * sizes).astype(np.int32)
        prep = dyn_header_params_batch(jnp.asarray(rows), jnp.asarray(ends))
        assert int(prep["ok"][i]) == 1
        assert int(prep["min_len"][i]) >= MIN_LIT_LEN
        tok, ntok, tot, endp, err = tokenize_dyn_batch(
            jnp.asarray(rows), jnp.asarray(ends), prep["tab"], prep["start"],
            pw=_fused_pw(self.CH), interpret=True,
        )
        from tpu_deflate.ops.decode import chunk_pwin

        _tk, _ta, _tb, _tp, _t2, _pos, e2 = tokenize(
            jnp.asarray(rows[i]), 0, tok_cap=self.CH + 16,
            end_bit=int(ends[i]), pwin=chunk_pwin(self.CH),
            stop_at_eob=True, static_only=False,
        )
        assert int(err[i]) == int(e2)

    def test_decode_rows_batch_dynamic_roundtrip(self, dyn_container):
        payloads, rows, sizes = dyn_container
        out, totals, errs = decode_rows_batch(
            jnp.asarray(rows), jnp.asarray((8 * sizes).astype(np.int32)),
            out_cap=self.CH, tok_cap=self.CH + 16, static_only=False,
            interpret=True,
        )
        for i, p in enumerate(payloads):
            assert int(errs[i]) == 0
            assert np.asarray(out)[i, : int(totals[i])].tobytes() == p

    def test_tier2_parity_short_codes(self, rng):
        """The foreign loop's tier-2 kernel (33-visit walk) must match the
        XLA tokenize on blocks whose literal tree has 2-bit codes."""
        from tpu_deflate.kernels.tokenize_dyn import tokenize_dyn_batch
        from tpu_deflate.ops.decode import (
            _fused_pw,
            chunk_pwin,
            dyn_header_params_batch,
            tokenize,
        )

        # a two-symbol alphabet -> 2-bit literal codes in zlib's tree
        pool = b"ab"
        payload = bytes(
            pool[i] for i in rng.integers(0, len(pool), 3072)
        )
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        s = co.compress(payload) + co.flush()
        rows = np.zeros((1, 4096), np.uint8)
        rows[0, : len(s)] = np.frombuffer(s, np.uint8)
        ends = np.asarray([8 * len(s)], np.int32)
        prep = dyn_header_params_batch(jnp.asarray(rows), jnp.asarray(ends))
        ml = int(prep["min_len"][0])
        assert ml == 2, f"fixture drift: min_len {ml}"
        pw = _fused_pw(3072)
        tok, ntok, tot, endp, err = tokenize_dyn_batch(
            jnp.asarray(rows), jnp.asarray(ends), prep["tab"], prep["start"],
            pw=pw, interpret=True, tier=2,
        )
        tk, ta, tb, tp, t2, pos, e2 = tokenize(
            jnp.asarray(rows[0]), 0, tok_cap=4096, end_bit=int(ends[0]),
            pwin=chunk_pwin(3072), stop_at_eob=True, static_only=False,
        )
        tp = int(tp)
        assert int(err[0]) == int(e2) == 0
        assert int(ntok[0]) == tp
        assert int(tot[0]) == int(t2)
        assert int(endp[0]) == int(pos)
        tok = np.asarray(tok)
        np.testing.assert_array_equal(
            ((tok[0] >> 26) & 3)[:tp], np.asarray(tk)[:tp]
        )
        np.testing.assert_array_equal(
            ((tok[0] >> 17) & 0x1FF)[:tp], np.asarray(ta)[:tp]
        )
        np.testing.assert_array_equal(
            (tok[0] & 0x1FFFF)[:tp], np.asarray(tb)[:tp]
        )

    def test_decode_rows_batch_fallback_on_short_codes(self, dyn_container):
        """A batch containing a min_len < 3 lane must still round-trip
        (the whole batch routes to the XLA tokenize via the gate)."""
        from tpu_deflate.kernels.tokenize_dyn import MIN_LIT_LEN
        from tpu_deflate.ops.decode import dyn_header_params_batch

        payloads, rows, sizes = dyn_container
        prep = dyn_header_params_batch(
            jnp.asarray(rows), jnp.asarray((8 * sizes).astype(np.int32))
        )
        ml = np.asarray(prep["min_len"])
        ok = np.asarray(prep["ok"])
        # the z*CH lane: either skewed dynamic (short codes) or stored
        assert (((ml < MIN_LIT_LEN) & (ok == 1)) | (ok == 0)).any()


class TestDecodeRowsBatch:
    def test_fused_path_interpret(self, static_streams):
        M = PW // 8 + 32
        B = len(static_streams)
        rows = np.zeros((B, M), np.uint8)
        ends = np.zeros((B,), np.int32)
        for i, (_p, s) in enumerate(static_streams):
            rows[i, : len(s)] = np.frombuffer(s, np.uint8)
            ends[i] = 8 * len(s)
        out, totals, errs = decode_rows_batch(
            jnp.asarray(rows), jnp.asarray(ends), out_cap=2048,
            tok_cap=2064, static_only=True, interpret=True,
        )
        for i, (p, _s) in enumerate(static_streams):
            assert int(errs[i]) == 0
            assert np.asarray(out)[i, : int(totals[i])].tobytes() == p
