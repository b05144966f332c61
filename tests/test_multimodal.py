

class TestHeaderSniffing:
    """Real (unstubbed) container-header parsing."""

    def test_roundtrip_all_formats(self, spark):
        import pandas as pd

        from web_scrapper_spark.operators.multimodal import (
            build_container_payload,
            sniff_media_headers,
        )

        rows = [
            (i, build_container_payload(k, i))
            for i, k in enumerate(["png", "gif", "jpeg", "wav", "garbage"])
        ]
        media = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"]),
            "media_id long, payload binary",
        )
        got = {r["media_id"]: r for r in sniff_media_headers(media).collect()}
        assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 1, 1)
        assert (got[1]["format"], got[1]["width"]) == ("gif", 2)
        assert (got[2]["format"], got[2]["height"]) == ("jpeg", 15)
        assert (got[3]["format"], got[3]["sample_rate"], got[3]["channels"]) == (
            "wav", 20000, 2,
        )
        assert got[4]["format"] is None and got[4]["valid"] is False

    def test_truncated_headers_invalid_not_crash(self, spark):
        import pandas as pd

        from web_scrapper_spark.operators.multimodal import sniff_media_headers

        rows = [
            (1, b"\x89PNG\r\n\x1a\nxx"),          # truncated png
            (2, b"RIFF\x04\x00\x00\x00WAVE"),     # wave, no fmt chunk
            (3, b"\xff\xd8\xff\xd9"),             # jpeg, no SOF
            (4, None),                             # null payload
        ]
        media = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"]),
            "media_id long, payload binary",
        )
        got = {r["media_id"]: r for r in sniff_media_headers(media).collect()}
        assert all(not got[i]["valid"] for i in (1, 2, 3, 4))
        assert got[1]["format"] == "png" and got[3]["format"] == "jpeg"
