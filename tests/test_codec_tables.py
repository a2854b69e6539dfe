"""SPARK_GRAFT_CODEC_TABLES verified-constants hook: loader
validation (Kraft/structural checks for JBIG2 Annex B tables, shape
checks for the QM table, the FUNCTIONAL reconstruction check for the
MP3 synthesis window) and declared-synthetic end-to-end wiring
through the SBHUFF standard-table selectors and the PCM synthesis
filterbank. No test here ever claims a synthetic table is the
standard one — the gates stay honest when the hook is unset."""

from __future__ import annotations

import json

import numpy as np
import pytest

from ccgp_data_wrangling_spark.codec_tables import (
    load_codec_tables,
    pqmf_reconstruction_snr,
    reset_codec_tables_cache,
    synthetic_pqmf_window,
)

# synthetic Annex-B-shaped tables (Kraft-complete; FS spans negatives
# via a lower line and has no OOB, DS carries OOB, DT is one-sided)
_SYN_B6 = [[2, 4, 0], [2, 4, 16], [2, 5, 32],
           [3, 32, -1, "lower"], [3, 32, 64, "upper"]]
_SYN_B8 = [[2, 3, 0], [2, 3, 8], [2, 4, 16],
           [3, 32, -1, "lower"], [4, 32, 32, "upper"],
           [4, 0, 0, "oob"]]
_SYN_B11 = [[1, 2, 0], [2, 3, 4], [3, 4, 12],
            [3, 32, 28, "upper"]]


def _write_tables(tmp_path, monkeypatch, payload: dict) -> None:
    p = tmp_path / "tables.json"
    p.write_text(json.dumps(payload))
    monkeypatch.setenv("SPARK_GRAFT_CODEC_TABLES", str(p))
    reset_codec_tables_cache()


@pytest.fixture(autouse=True)
def _clean_cache(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CODEC_TABLES", raising=False)
    reset_codec_tables_cache()
    yield
    reset_codec_tables_cache()


class TestLoader:
    def test_unset_env_keeps_gates(self):
        assert load_codec_tables() == {}
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            mp3_synthesize_pcm,
        )

        with pytest.raises(NotImplementedError, match="3-B.3"):
            mp3_synthesize_pcm(np.zeros((4, 32)))

    def test_jbig2_validation(self, tmp_path, monkeypatch):
        # Kraft-incomplete table rejected
        bad = {"jbig2_standard_tables": {"B.6": [[2, 4, 0]]}}
        _write_tables(tmp_path, monkeypatch, bad)
        with pytest.raises(ValueError, match="Kraft"):
            load_codec_tables()
        # DS table without OOB rejected
        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {"B.8": _SYN_B6},
        })
        with pytest.raises(ValueError, match="OOB"):
            load_codec_tables()
        # FS table with OOB rejected
        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {"B.6": _SYN_B8},
        })
        with pytest.raises(ValueError, match="no OOB"):
            load_codec_tables()
        # unknown table name rejected
        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {"B.2": _SYN_B6},
        })
        with pytest.raises(ValueError, match="unknown"):
            load_codec_tables()

    def test_qm_validation(self, tmp_path, monkeypatch):
        rows = [[0x5601, 1, 1, 1]] + [[0x3401, 0, 0, 0]] * 20
        _write_tables(tmp_path, monkeypatch, {"t81_qm": rows})
        assert len(load_codec_tables()["t81_qm"]) == 21
        _write_tables(tmp_path, monkeypatch, {
            "t81_qm": [[0x5601, 99, 0, 0]] * 20,
        })
        with pytest.raises(ValueError, match="escapes"):
            load_codec_tables()
        _write_tables(tmp_path, monkeypatch, {
            "t81_qm": [[0, 0, 0, 0]] * 20,
        })
        with pytest.raises(ValueError, match="Qe"):
            load_codec_tables()

    def test_window_validation_functional(self, tmp_path, monkeypatch):
        # wrong length
        _write_tables(tmp_path, monkeypatch, {
            "mp3_synthesis_window": [0.0] * 100,
        })
        with pytest.raises(ValueError, match="512"):
            load_codec_tables()
        # garbage taps fail the reconstruction check (~0 dB)
        rng = np.random.default_rng(1)
        _write_tables(tmp_path, monkeypatch, {
            "mp3_synthesis_window": rng.normal(size=512).tolist(),
        })
        with pytest.raises(ValueError, match="reconstruction"):
            load_codec_tables()
        # even a single corrupted tap of an otherwise-good window
        # fails — this is a real transcription check
        win = synthetic_pqmf_window()
        win[100] += 0.7
        _write_tables(tmp_path, monkeypatch, {
            "mp3_synthesis_window": win,
        })
        with pytest.raises(ValueError, match="reconstruction"):
            load_codec_tables()

    def test_synthetic_window_passes(self, tmp_path, monkeypatch):
        win = synthetic_pqmf_window()
        snr, gain = pqmf_reconstruction_snr(np.asarray(win))
        assert snr >= 50.0
        assert 0.9 <= gain <= 1.1
        _write_tables(tmp_path, monkeypatch, {
            "mp3_synthesis_window": win,
        })
        assert load_codec_tables()["mp3_window"].shape == (512,)


class TestJbig2StandardSelectors:
    def _tabs(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import HuffTable

        def build(lines):
            return HuffTable([tuple(ln) for ln in lines])

        return {"fs": build(_SYN_B6), "ds": build(_SYN_B8),
                "dt": build(_SYN_B11)}

    def _region(self, hsel):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_text_region_data,
        )

        syms = [
            np.array([[1, 1, 0], [0, 1, 1]], dtype=bool),
            np.array([[1, 0], [0, 1], [1, 1]], dtype=bool),
        ]
        instances = [(0, 1, 1), (1, 6, 2), (0, 11, 1), (1, 16, 5)]
        data = _build_text_region_data(
            instances, syms, (24, 10), huffman_tabs=self._tabs(),
            huffman_sel=hsel,
        )
        return data, syms

    def test_standard_selectors_gate_without_hook(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_text_region_segment,
        )

        data, syms = self._region((0, 0, 0))
        with pytest.raises(NotImplementedError, match="B.6"):
            decode_text_region_segment(data, syms)

    def test_standard_selectors_decode_with_loaded_tables(
        self, tmp_path, monkeypatch
    ):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_text_region_segment,
        )

        # custom-table decode as the reference result
        data_custom, syms = self._region((3, 3, 3))
        tabs = self._tabs()
        ref = decode_text_region_segment(
            data_custom, syms,
            tables=[tabs["fs"], tabs["ds"], tabs["dt"]],
        )
        # same region, standard selectors resolved through the hook
        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {
                "B.6": _SYN_B6, "B.8": _SYN_B8, "B.11": _SYN_B11,
            },
        })
        data_std, _ = self._region((0, 0, 0))
        got = decode_text_region_segment(data_std, syms)
        assert got["n_instances"] == 4
        assert np.array_equal(got["bitmap"], ref["bitmap"])
        assert got["bitmap"].sum() == sum(
            s.sum() for s in (syms[0], syms[1], syms[0], syms[1])
        )


class TestPcmSynthesis:
    def test_single_band_synthesis_is_narrowband(self):
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            mp3_synthesize_pcm,
        )

        win = np.asarray(synthetic_pqmf_window())
        k = 4
        frames = np.zeros((64, 32))
        frames[:, k] = np.sin(np.arange(64) / 3.0)
        y = mp3_synthesize_pcm(frames, window=win)
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        peak = spec.argmax() / len(y)  # cycles/sample
        center = (2 * k + 1) / 128.0
        assert abs(peak - center) < 1.5 / 128.0

    def test_pcm_roundtrip_through_analysis_twin(self):
        # PCM -> analysis -> synthesis must reconstruct the PCM (the
        # direction near-PR guarantees); ~55 dB for the synthetic
        from ccgp_data_wrangling_spark.codec_tables import (
            _pqmf_analyze,
            _pqmf_synthesize,
        )

        win = np.asarray(synthetic_pqmf_window())
        t = np.arange(32 * 70, dtype=np.float64)
        x = np.sin(t / 4.0) + 0.4 * np.sin(t / 9.3 + 1.0)
        y = _pqmf_synthesize(_pqmf_analyze(x, win), win)
        d = 481
        n = len(x) - d - 64
        err = x[:n] - y[d:d + n]
        snr = 10 * np.log10(
            float((x[:n] ** 2).mean()) / float((err**2).mean())
        )
        assert snr >= 50.0

    def test_layer2_stream_to_pcm_end_to_end(
        self, tmp_path, monkeypatch
    ):
        # real Layer II frames -> subband dequant (collect_samples)
        # -> PCM through the env-loaded declared-synthetic window.
        # The oracle is the CLOSED-FORM filterbank response: the
        # synthesis is linear, and its per-band impulse response is
        # g_k[n] = D[n]*cos((2k+1)((n mod 64)+16)*pi/64) (derived
        # from the V/U index dance), so direct convolution of the
        # collected subband samples with g_k must match exactly.
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            _L2_TABLES,
            build_mp3_layer2,
            decode_mp3_layer2_subbands,
            mp3_synthesize_pcm,
        )

        _write_tables(tmp_path, monkeypatch, {
            "mp3_synthesis_window": synthetic_pqmf_window(),
        })
        sbl = len(_L2_TABLES["b"])
        alloc = [0] * sbl
        alloc[0], alloc[2], alloc[5] = 2, 1, 3
        blob = build_mp3_layer2(
            sample_rate=44100, bitrate_kbps=96, alloc_idx=alloc,
            scfsi=[0 for _ in alloc],
            scf_idx=lambda sb, j: 10 + 2 * sb + j,
            codes=lambda t, sb: (t * 5 + sb) % 3, n_frames=3,
        )
        collected: list = []
        decode_mp3_layer2_subbands(blob, collect_samples=collected)
        assert len(collected) == 3
        frames = np.concatenate(
            [f[0] for f in collected], axis=0
        )  # (3*36, 32) mono
        assert frames[:, 0].any() and not frames[:, 1].any()
        y = mp3_synthesize_pcm(frames)  # window from the hook
        assert y.shape == (3 * 36 * 32,)
        win = np.asarray(synthetic_pqmf_window())
        n512 = np.arange(512)
        expected = np.zeros(len(y) + 512)
        for k in range(32):
            if not frames[:, k].any():
                continue
            g = win * np.cos(
                (2 * k + 1) * (n512 % 64 + 16) * np.pi / 64.0
            )
            for f in range(len(frames)):
                if frames[f, k]:
                    expected[32 * f:32 * f + 512] += frames[f, k] * g
        assert np.allclose(y, expected[:len(y)], atol=1e-9)


class TestSdhuffRefagg:
    """SDHUFF + SDREFAGG (T.88 §6.5.8.2.2, single instance): the
    combination previously gated entirely on Table B.15 — with the
    hook supplying a synthetic B.15-shaped table, the full Huffman
    refinement dictionary decodes; without it, the gate names the
    table."""

    _SYN_B15 = [[2, 2, -2], [2, 2, 2], [2, 4, 6],
                [3, 32, -3, "lower"], [3, 32, 22, "upper"]]

    def _fixture(self):
        rng = np.random.default_rng(77)
        base0 = rng.random((6, 8)) < 0.4
        base1 = rng.random((7, 5)) < 0.5
        t0 = base0.copy()
        t0[2:4, 3:6] ^= True          # same-size refinement
        t1 = np.zeros((8, 7), bool)   # grown refinement
        t1[:7, 1:6] = base1
        t1[0, 0] = True
        t2 = t0.copy()
        t2[0, :3] = True              # refines a NEW symbol (pool)
        entries = [
            {"bitmap": t0, "ref": 0, "rdx": 1, "rdy": -1},
            {"bitmap": t2, "ref": 2, "rdx": 0, "rdy": 0},
            {"bitmap": t1, "ref": 1, "rdx": -2, "rdy": 2},
        ]
        return [base0, base1], entries

    def test_gates_without_hook(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_symbol_dict_segment,
        )
        import struct

        # minimal SDHUFF+REFAGG header (rtemplate=1: no SDRAT)
        head = struct.pack(">H", 1 | 2 | (1 << 12))
        head += struct.pack(">II", 1, 1)
        with pytest.raises(NotImplementedError, match="B.15"):
            decode_symbol_dict_segment(head + b"\x00" * 8)

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_round_trip_with_loaded_table(
        self, tmp_path, monkeypatch, rtemplate
    ):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_symbol_dict_huffman_refagg,
            decode_symbol_dict_segment,
        )

        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {"B.15": self._SYN_B15},
        })
        input_syms, entries = self._fixture()
        data = _build_symbol_dict_huffman_refagg(
            entries, input_syms, rtemplate=rtemplate,
        )
        out = decode_symbol_dict_segment(data, input_syms=input_syms)
        assert len(out) == 3
        for got, ent in zip(out, entries):
            assert np.array_equal(got, ent["bitmap"]), ent["ref"]

    _SYN_B11b = [[1, 2, 0], [2, 3, 4], [3, 4, 12],
                 [3, 32, 28, "upper"]]
    _SYN_B14 = [[2, 2, -2], [2, 2, 2], [2, 3, 6],
                [3, 32, -3, "lower"], [3, 32, 14, "upper"]]

    def test_aggregate_nested_huffman_text_region(
        self, tmp_path, monkeypatch
    ):
        # REFAGGNINST>1 with SDHUFF: the aggregate decodes as a
        # nested HUFFMAN text region over the spec-fixed standard
        # tables (DT=B.11, FS=B.6, DS=B.8, RDW/RDH=B.14,
        # RDX/RDY=B.15) — all hook-loaded synthetics here
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_symbol_dict_huffman_refagg,
            decode_symbol_dict_segment,
        )

        _write_tables(tmp_path, monkeypatch, {
            "jbig2_standard_tables": {
                "B.6": _SYN_B6, "B.8": _SYN_B8,
                "B.11": self._SYN_B11b, "B.14": self._SYN_B14,
                "B.15": self._SYN_B15,
            },
        })
        rng = np.random.default_rng(79)
        base0 = rng.random((4, 5)) < 0.4
        base1 = rng.random((4, 3)) < 0.5
        refined = np.zeros((5, 4), bool)
        refined[:4, :3] = base1
        refined[4, 0] = refined[0, 3] = True
        # aggregate: two plain instances + one refined, composed
        # into a 7x14 symbol; then a single-instance refinement OF
        # THE AGGREGATE (pool reference to a new symbol)
        agg = {
            "h": 7, "w": 14,
            "aggregate": [
                (0, 0, 0),
                (1, 6, 1),
                (0, 9, 2,
                 {"bitmap": refined, "rdx": 1, "rdy": 0}),
            ],
        }
        expected = np.zeros((7, 14), bool)
        expected[0:4, 0:5] |= base0
        expected[1:5, 6:9] |= base1
        expected[2:7, 9:13] |= refined
        follow = expected.copy()
        follow[0, 13] = True
        entries = [
            agg,
            {"bitmap": follow, "ref": 2, "rdx": 0, "rdy": 0},
        ]
        data = _build_symbol_dict_huffman_refagg(
            entries, [base0, base1], rtemplate=1,
        )
        out = decode_symbol_dict_segment(
            data, input_syms=[base0, base1]
        )
        assert len(out) == 2
        assert np.array_equal(out[0], expected)
        assert np.array_equal(out[1], follow)
