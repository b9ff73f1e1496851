"""The generator's payload-weight knob must never leak into crawl semantics.

``CRAWLSPARK_BODY_WORDS`` (tests/gen_pages.py) fattens each page's
text/html for the heavy-payload scaling bench (tools/heavy_scaling.py);
everything the crawl's control flow depends on — urls, hosts, outlinks,
capture counts/timestamps, langs, seeds — must stay a pure function of the
page index, so a heavy corpus replays the light corpus's exact fetch
order.  The knob is read at import time, so the heavy view is sampled in a
subprocess (same contract as the skew knob).  The full-scale digest
identity is asserted by the bench tool itself; this test pins the
row-level invariant cheaply, without Spark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_SAMPLER = """
import sys, json
sys.path.insert(0, {tests_dir!r})
import gen_pages as gp
out = []
for i in range(300):
    rows = gp.page_rows(i, 5000)
    out.append({{
        "url": rows[0]["url"],
        "n_captures": len(rows),
        "ts": [str(r["warc_ts"]) for r in rows],
        "lang": rows[0]["lang"],
        "links": gp.outlinks_of(i, 5000),
        "html_bytes": sum(len(r["html"]) for r in rows),
        "text_words": len(rows[0]["text"].split()),
    }})
out.append({{"seeds": gp.gen_seeds(5000, 50)}})
print(json.dumps(out))
"""


def _sample(body_words: int | None) -> list[dict]:
    env = dict(os.environ)
    env.pop("CRAWLSPARK_BODY_WORDS", None)
    if body_words is not None:
        env["CRAWLSPARK_BODY_WORDS"] = str(body_words)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    p = subprocess.run(
        [sys.executable, "-c", _SAMPLER.format(tests_dir=tests_dir)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(p.stdout)


def test_body_words_knob_changes_only_payload():
    light = _sample(None)
    heavy = _sample(500)
    for lrow, hrow in zip(light[:-1], heavy[:-1]):
        assert lrow["url"] == hrow["url"]
        assert lrow["n_captures"] == hrow["n_captures"]
        assert lrow["ts"] == hrow["ts"]
        assert lrow["lang"] == hrow["lang"]
        assert lrow["links"] == hrow["links"]
    assert light[-1]["seeds"] == heavy[-1]["seeds"]
    # and the payload really is heavier: base words 20 -> 500
    lw = sum(r["text_words"] for r in light[:-1])
    hw = sum(r["text_words"] for r in heavy[:-1])
    assert hw > lw * 5
    lb = sum(r["html_bytes"] for r in light[:-1])
    hb = sum(r["html_bytes"] for r in heavy[:-1])
    assert hb > lb * 4


def test_body_words_unset_is_bit_identical_legacy():
    # the default corpus (knob unset) must equal an explicit base of 20 —
    # i.e. the knob's default reproduces the legacy generator exactly, so
    # every pinned bench constant (n_fetched = 682,032) and golden stays
    # valid
    assert _sample(None) == _sample(20)
