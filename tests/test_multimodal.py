"""Multimodal binary plumbing: metadata extraction is pure Catalyst;
decode stage schema/batching is real, codec stubbed (fake=True path)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import (
    multimodal as MM,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG\r\n\x1a\nrestofpng")),
        ("m2", "audio", bytearray(b"RIFF....WAVEdata")),
        ("m3", "image", bytearray(b"")),
    ]
    return spark.createDataFrame(rows, "media_id string, kind string, blob binary")


def test_metadata_no_decode(media_df):
    rows = MM.media_metadata(media_df, "media_id", "blob", "kind").collect()
    by_id = {r["media_id"]: r for r in rows}
    assert by_id["m1"]["byte_len"] == len(b"\x89PNG\r\n\x1a\nrestofpng")
    assert by_id["m1"]["header_hex"] == b"\x89PNG\r\n\x1a\n".hex()
    assert by_id["m3"]["byte_len"] == 0


def test_decode_stub_raises_without_fake(media_df):
    out = MM.decode_media(media_df, "media_id", "blob", "kind", fake=False)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_fake_decode_deterministic_features(media_df):
    out = MM.decode_media(media_df, "media_id", "blob", "kind", fake=True).collect()
    by_id = {r["media_id"]: r for r in out}
    payload = b"\x89PNG\r\n\x1a\nrestofpng"
    digest = hashlib.md5(payload).digest()
    want = [pytest.approx(digest[i] / 255.0) for i in range(8)]
    assert list(by_id["m1"]["feature"]) == want
    assert by_id["m1"]["sha1"] == hashlib.sha1(payload).hexdigest()
    assert by_id["m2"]["kind"] == "audio"
    assert len(by_id["m3"]["feature"]) == 8
