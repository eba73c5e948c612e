"""Media-pipeline 10× stress probe → STRESS.md rows.

tools/stress_probe.py replicates the RELATIONAL tables 10×, but the
media corpora are synthesized from doc_id with a `doc_id < 200`
filter, so the table replication never grows their work — round 7's
probe correctly labeled them "overhead-bound at test scale", which
means their scaling story was untested. This probe scales the CORPUS
itself: it rebuilds each media pipeline over spark.range(N) docs at
N=200 (the registered-query size) and N=2000, timing the identical
encode→decode→stats chain. Healthy = ratio ≈ 10 (the work is per-doc
and Arrow-batched; nothing is quadratic) — except the phash near-dup
join, whose candidate pairs grow with per-band collision counts and
should stay well under the 100× a quadratic all-pairs join would show.

Usage: python tools/media_stress_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark, n: int):
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .repartition(32, "doc_id")
    )


def _pipelines():
    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        audio_spectrograms,
        decode_images,
        phash_images,
    )
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _media_payloads_jpeg,
        _media_payloads_phash,
        _media_payloads_square_wav,
        _media_payloads_tiff_compressed,
    )

    def jpeg(docs):
        return decode_images(_media_payloads_jpeg(docs))

    def spectrogram(docs):
        return audio_spectrograms(_media_payloads_square_wav(docs))

    def phash_neardup(docs):
        # the full b19_phash_image_neardup dataflow minus the final
        # collect-side ordering: hash → 4-band LSH → verified pairs
        hashes = phash_images(_media_payloads_phash(docs))
        bands = hashes.select(
            "doc_id",
            "phash",
            F.explode(
                F.array(
                    *[
                        F.lit(b) * 65536
                        + F.shiftrightunsigned("phash", 16 * b).bitwiseAND(
                            F.lit(65535)
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band_key"),
        )
        cand = (
            bands.alias("l")
            .join(bands.alias("r"), "band_key")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("d1"),
                F.col("r.doc_id").alias("d2"),
                F.col("l.phash").alias("ha"),
                F.col("r.phash").alias("hb"),
            )
            .distinct()
        )
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        return cand.select("d1", "d2", ham.alias("hamming")).where(
            ham <= 10
        )

    def tiff_lzw(docs):
        return decode_images(_media_payloads_tiff_compressed(docs))

    return {
        "b22_jpeg_decode[corpus]": jpeg,
        "b22_audio_spectrogram[corpus]": spectrogram,
        "b19_phash_image_neardup[corpus]": phash_neardup,
        "b22_tiff_lzw[corpus]": tiff_lzw,
    }


def _time(build, spark, n: int) -> float:
    def once():
        t0 = time.perf_counter()
        build(_docs(spark, n)).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    once()  # warm
    return min(once(), once())


def main() -> int:
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("media-stress-probe")
    rows = []
    for name, build in _pipelines().items():
        t1 = _time(build, spark, 200)
        t10 = _time(build, spark, 2000)
        ratio = t10 / t1 if t1 > 0 else float("inf")
        rows.append((name, t1, t10, ratio))
        print(f"{name}: 200 docs {t1:.2f}s  2000 docs {t10:.2f}s  "
              f"ratio {ratio:.1f}")
    print("\nMarkdown rows (paste into STRESS.md manual section):")
    for name, t1, t10, ratio in rows:
        print(f"| {name} | {t1:.2f} s | {t10:.2f} s | {ratio:.1f}× |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
