"""Unicode cross-engine parity sweep: append deterministic multibyte /
edge-case documents to one sf tier and run EVERY oracle-paired driver
query through tests/driver_compare.compare_one against its DuckDB twin.

Why: the fixtures (and therefore every driver correctness check ever
run) are pure ASCII, so the Spark-vs-DuckDB twin contract has never
been exercised where engines classically diverge — character vs
UTF-16-unit lengths, default-locale casing (Turkish I, final sigma,
Eszett), regex character classes, split on multibyte/invisible
whitespace, md5 over UTF-8 bytes, E-notation rendering of values
derived from multibyte-length arithmetic. A web-scale corpus is never
ASCII; a twin that silently diverges on CJK is a wrong oracle.

Cases appended (documents table only; siblings verbatim):
CJK no-space, emoji + ZWJ, NFC vs NFD accents, RTL Arabic/Hebrew,
zero-width space and NBSP inside "words", Turkish dotted/dotless I,
German Eszett, Greek final sigma, full-width Latin, astral-plane
(surrogate-pair) letters, U+2028/U+0085 line separators, long repeated
multibyte word, digits in other scripts, mixed combining marks.

Staged (pre-window) entries sweep too, via _staged_queries /
_staged_oracle_sql.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

UNI_DOCS = [
    # (text, source) — doc_id assigned sequentially after max
    ("東京は日本の首都です。人工知能は面白い。東京東京東京。", "src0"),
    ("データ 処理 エンジン データ 処理 エンジン データ", "src1"),
    ("👩‍👩‍👧‍👦 family 🌍🌏🌎 emoji test 👩‍👩‍👧‍👦 family again 🚀", "src2"),
    ("café composed café decomposed café mix", "src3"),
    ("العربية نص rtl test "
     "עברית mixed ltr", "src4"),
    ("foo​bar zero​width words nbsp joined here", "src5"),
    ("İstanbul ıspartı III iii Istanbul istanbul", "src6"),
    ("straße STRASSE groß GROSS ẞß", "src7"),
    ("Σοφός οδός "
     "ΟΔΟΣ σς sigma", "src8"),
    ("ＦＵＬＬ　ＷＩＤＴＨ "
     "fullwidth ascii mix", "src9"),
    ("\U0001d573\U0001d52e\U0001d529\U0001d529\U0001d52c astral "
     "\U00010437\U00010437 plane text", "src10"),
    ("line1 line2 line3 separators inline", "src11"),
    ("क़ुँ combining नमस्ते "
     "marks अनुच्छेद", "src12"),
    ("٠١٢ ০১২ digits 一二三 "
     "other scripts 123", "src13"),
    (("東京" * 40) + " long multibyte word " + ("東京" * 40),
     "src14"),
]


def build_unicode_dir(src: str, dst: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))

    d = pq.read_table(os.path.join(dst, "documents.parquet"))
    cols = {c: d.column(c).to_pylist() for c in d.column_names}
    base = {c: cols[c][0] for c in cols}
    mx = max(cols["doc_id"])
    for i, (text, source) in enumerate(UNI_DOCS):
        for c in cols:
            if c == "doc_id":
                cols[c].append(mx + 1 + i)
            elif c == "text":
                cols[c].append(text)
            elif c == "source":
                cols[c].append(source)
            elif c == "n_chars":
                # python len == code points == both engines' length()
                cols[c].append(len(text))
            else:
                cols[c].append(base[c])
    pq.write_table(
        pa.table(
            {c: pa.array(v, d.schema.field(c).type) for c, v in cols.items()}
        ),
        os.path.join(dst, "documents.parquet"),
    )
    return len(UNI_DOCS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/uni_sf")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_intermixed_args()

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.join(here, "tests"))
    import __spark_entry__ as E
    import driver_compare as DC
    from audiopro_essentia_spark.session import get_spark

    n = build_unicode_dir(args.src, args.dst)
    print(f"built {args.dst} (+{n} unicode docs)", flush=True)

    busy = "/tmp/spark_busy"
    owned_marker = not os.path.exists(busy)
    if owned_marker:
        open(busy, "w").close()
    failed, ok, rows_only = [], [], []
    try:
        spark = get_spark(master="local[8]", app_name="unicode-sweep")
        con = DC.duck_con(args.dst)
        qs = dict(E.queries())
        oracles = dict(E.oracle_sql())
        qs.update({f"staged:{k}": v
                   for k, v in getattr(E, "_staged_queries", dict)().items()})
        oracles.update(
            {f"staged:{k}": v
             for k, v in getattr(E, "_staged_oracle_sql", dict)().items()})
        only = set(args.queries or [])
        for name, qfn in qs.items():
            if only and name not in only and name.removeprefix("staged:") not in only:
                continue
            if name not in oracles:
                rows_only.append(name)
                continue
            try:
                problems, nrows = DC.compare_one(
                    spark, con, name, qfn, oracles[name], args.dst
                )
            except Exception as e:  # noqa: BLE001
                print(f"  {name:<22} ERROR {type(e).__name__}: {str(e)[:300]}")
                failed.append(name)
                continue
            if problems:
                print(f"  {name:<22} MISMATCH ({nrows} rows): "
                      + " | ".join(p[:400] for p in problems))
                failed.append(name)
            else:
                ok.append(name)
    finally:
        if owned_marker and os.path.exists(busy):
            os.remove(busy)

    print(f"OK: {len(ok)}  no-oracle (skipped): {len(rows_only)}")
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
