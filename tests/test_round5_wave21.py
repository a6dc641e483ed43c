"""Round-5 wave-21 operator tests.

Oracle-checked media carriers (PNG dims/pixels, WAV duration,
quarantine contract) and exact daily active users. Ray session comes
from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestImageDims:
    def test_decode_matches_arithmetic(self):
        from pdf_extractor_ray.pipelines.multimodal import image_dims_documents

        got = image_dims_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert (got["width"].to_numpy() == 4 + d % 13).all()
        assert (got["height"].to_numpy() == 3 + d % 7).all()
        # exact pixel totals through encode→zlib→unfilter→decode
        for doc_id in got.index[:20]:
            w, h = 4 + doc_id % 13, 3 + doc_id % 7
            want = sum(w * ((doc_id + y) % 251) for y in range(h))
            assert got.loc[doc_id, "px_sum"] == want

    def test_row_varying_fill_exercises_unfilter(self):
        # two adjacent scanlines differ → per-row unfilter is live
        from pdf_extractor_ray.pipelines.multimodal import (
            _png_decode_pixels,
            encode_png,
        )

        y = np.arange(5, dtype=np.int64).reshape(5, 1)
        px = np.broadcast_to((7 + y) % 251, (5, 6)).astype(np.uint8)
        out, _ = _png_decode_pixels(encode_png(px))
        out = out.reshape(5, 6)  # decoder returns (h, w, channels)
        assert (out == px).all()
        assert len(np.unique(out[:, 0])) == 5


class TestWavDuration:
    def test_decode_matches_arithmetic(self):
        from pdf_extractor_ray.pipelines.multimodal import wav_duration_documents

        got = wav_duration_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert (got["n_samples"].to_numpy() == 100 + d % 500).all()
        assert (
            got["duration_ms"].to_numpy() == (100 + d % 500) * 1000 // 16000
        ).all()


class TestMediaQuarantine:
    def test_planted_split(self):
        from pdf_extractor_ray.pipelines.multimodal import media_quarantine_stats

        got = media_quarantine_stats(SF_DIR).to_pandas().set_index("status")
        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        bad = int(((ids % 6 == 1) | (ids % 6 == 3)).sum())
        assert got.loc["quarantined", "n"] == bad
        assert got.loc["ok", "n"] == len(ids) - bad

    def test_truncated_png_raises_value_error_only(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            _png_decode_pixels,
            encode_png,
        )

        good = encode_png(np.full((4, 5), 9, np.uint8))
        for cut in range(1, len(good)):
            try:
                _png_decode_pixels(good[:cut])
            except ValueError:
                pass  # the quarantine contract: ValueError, nothing else


class TestDailyActiveUsers:
    def test_matches_local_replica(self):
        from pdf_extractor_ray.pipelines.windows import events_daily_active_users

        got = (
            events_daily_active_users(SF_DIR)
            .to_pandas()
            .set_index("day")["dau"]
            .to_dict()
        )
        ev = pq.read_table(
            SF_DIR + "/events.parquet", columns=["user_id", "ts"]
        ).to_pandas()
        ev["day"] = pd.to_datetime(ev["ts"]).dt.strftime("%Y-%m-%d")
        want = ev.groupby("day")["user_id"].nunique().to_dict()
        assert got == want


class TestMediaFormatMatrix:
    def test_all_formats_present_and_pinned(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            media_format_matrix_documents,
        )

        got = media_format_matrix_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert set(got["fmt"]) == {"gif", "bmp", "jpeg", "video"}
        assert (got["width"].to_numpy() == 3 + d % 11).all()
        assert (got["height"].to_numpy() == 2 + d % 5).all()
        # spot-check one of each format's exact sum
        for doc_id, row in got.head(40).iterrows():
            w, h = 3 + doc_id % 11, 2 + doc_id % 5
            if row["fmt"] == "gif":
                want = w * h * 3 * (doc_id % 200)
            elif row["fmt"] == "bmp":
                want = sum(3 * w * ((doc_id + y) % 256) for y in range(h))
            elif row["fmt"] == "jpeg":
                want = w * h * 200
            else:
                want = (1 + doc_id % 4) * w * h * (doc_id % 256)
            assert row["px_sum"] == want, (doc_id, row["fmt"])

    def test_interlaced_gif_same_pixels(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            _gif_decode_pixels,
            encode_gif,
        )

        px = np.full((6, 5, 3), 77, np.uint8)
        px[0, 0] = (1, 2, 3)
        a = _gif_decode_pixels(encode_gif(px, interlace=False))
        b = _gif_decode_pixels(encode_gif(px, interlace=True))
        assert (a == b).all()


class TestThumbnail:
    def test_round_trip_matches_decimation(self):
        from pdf_extractor_ray.pipelines.multimodal import thumbnail_documents

        got = thumbnail_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert (got["thumb_w"].to_numpy() == (4 + d % 13 + 1) // 2).all()
        assert (got["thumb_h"].to_numpy() == (3 + d % 7 + 1) // 2).all()
        for doc_id in got.index[:20]:
            tw = (4 + doc_id % 13 + 1) // 2
            th = (3 + doc_id % 7 + 1) // 2
            want = sum(tw * ((doc_id + 2 * y) % 251) for y in range(th))
            assert got.loc[doc_id, "px_sum"] == want
