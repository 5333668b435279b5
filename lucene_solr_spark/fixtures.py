"""Deterministic synthetic `pages` corpus (FIXTURES.md §2) — the
BASELINE.json ``input_hint`` shape:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

seed=42, n_docs = round(1_000_000 * sf). Vocabulary = 10,000 synthetic terms
(w000000..w009999) + 200 real English head words (stopwords, possessives,
mixed case) drawn Zipf(s=1.07) so head-term skew is real; doc length
~ lognormal(mu=5.3, sigma=0.6) clipped to [8, 2048]; 2% of docs carry fixed
Unicode probe tokens; html = render(text) with a fixed, injective template
(boilerplate carries no visible text, so extract(html) == text byte-identical
per url — the per-row oracle of BASELINE.json).

Run:  python -m lucene_solr_spark.fixtures --sf 0.001 --out /tmp/pages_sf0.001
"""

from __future__ import annotations

import argparse
import datetime as _dt
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ZIPF_S = 1.07

# 200 real English head words: the 33 stopwords + common words + possessive
# and mixed-case forms (exercise EnglishPossessiveFilter / LowerCaseFilter).
_STOP33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()
_COMMON = (
    "search engine index query document term score rank data web page crawl "
    "text token stem filter match result field value store read write merge "
    "segment block list count time user link site html parse build run test "
    "fast slow large small new old good best first last next more most other "
    "over under about after before between during from up down out off all "
    "any each few many some own same so than too very can just should now "
    "work world system number part case point right left high low long short "
    "great little own public early young important bad different following "
    "Apache Lucene Solr Spark The Search Engine's world's engine's O'Neil "
    "team's NASA HTTP U.S.A running quickly relational conditional rational "
    "motoring plastered hopefulness adjustment believe between body business "
    "change children city community company country day development door "
    "education end example eye face fact family father force friend game girl "
    "government group guy hand head health history home hour house idea "
    "information issue job kind kid land law level life line lot man member "
    "minute moment money month morning mother name night office"
).split()
HEAD_WORDS = (_STOP33 + _COMMON)[:200]
assert len(HEAD_WORDS) == 200, len(HEAD_WORDS)

UNICODE_PROBES = ["café", "naïve", "中文", "日本", "straße"]

LANGS = ["en", "de", "fr", "es", "zh"]


def _vocab() -> list[str]:
    return [f"w{i:06d}" for i in range(10_000)] + HEAD_WORDS


def _lang_for_url(url: str) -> str:
    # 'en' 80%, others 5% each, seeded by hash(url) (FIXTURES.md §2)
    h = int.from_bytes(hashlib.sha1(url.encode()).digest()[:4], "big")
    r = h % 100
    if r < 80:
        return "en"
    return LANGS[1 + (r - 80) // 5]


def render_html(text: str, noisy: bool, entity_encode: bool) -> bytes:
    """Fixed injective template. All boilerplate is markup-only (comments,
    attributes, script/style) — no visible character data besides `text` —
    so HTMLStrip-style extraction round-trips byte-identically."""
    toks = text.split(" ")
    paras = []
    for i in range(0, len(toks), 13):
        chunk = " ".join(toks[i : i + 13])
        if entity_encode and chunk:
            # numeric-entity-encode the first char (decode path exercised)
            chunk = f"&#{ord(chunk[0])};" + chunk[1:]
        paras.append(f"<p>{chunk}</p>")
    noise = ""
    if noisy:
        noise = (
            "<style>body{font:&quot;Arial&quot;;}</style>"
            "<script>var a = 1 &amp;&amp; 2; if (a < 3) { a = a &gt; 0; }</script>"
        )
    html = (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>"
        f"<title></title>{noise}</head>"
        "<body><!-- nav: home &gt; section &amp; page -->"
        "<div class=\"nav\" data-crumb=\"home &gt; page\"></div>"
        + "".join(paras)
        + "</body></html>"
    )
    return html.encode("utf-8")


def generate_pages(n_docs: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    v = len(vocab)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()
    # Zipf over a shuffled rank->word assignment so head terms mix synthetic
    # and real words deterministically.
    perm = rng.permutation(v)
    vocab = vocab[perm]

    lengths = np.clip(
        rng.lognormal(5.3, 0.6, size=n_docs).astype(np.int64), 8, 2048
    )
    total = int(lengths.sum())
    flat = rng.choice(v, size=total, p=p)
    words = vocab[flat]
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    urls, texts, htmls, ts_list, langs = [], [], [], [], []
    epoch = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    for i in range(n_docs):
        url = f"https://example{i % 97}.org/p/{i}"
        toks = words[offsets[i] : offsets[i + 1]].tolist()
        if i % 50 == 0:  # 2% of docs: unicode probe tokens
            toks = toks + UNICODE_PROBES
        text = " ".join(toks)
        noisy = i % 20 == 5  # 5%: script/style noise + entity encoding
        urls.append(url)
        texts.append(text)
        htmls.append(render_html(text, noisy, noisy))
        ts_list.append(epoch + _dt.timedelta(seconds=137 * i))
        langs.append(_lang_for_url(url))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_list, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(sf: float, out_path: str, seed: int = SEED) -> int:
    n = round(1_000_000 * sf)
    table = generate_pages(n, seed)
    # small row groups keep the file splittable: Spark maps read partitions
    # to row-group boundaries, so a single-row-group file would scan on one
    # core no matter the cluster size
    pq.write_table(table, out_path, row_group_size=8192)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    n = write_pages(args.sf, args.out)
    print(f"wrote {n} pages -> {args.out}")


if __name__ == "__main__":
    main()
