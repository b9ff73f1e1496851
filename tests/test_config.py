"""CrawlConfig validation + env-knob semantics (r5 review findings)."""

import pytest

from crawlspark import config


def test_frontier_split_requires_sliver_broadcast():
    # silently falling back to the full-frontier exchange would defeat the
    # flag's purpose at cluster scale — must refuse loudly
    with pytest.raises(ValueError, match="sliver_broadcast"):
        config.CrawlConfig(frontier_split=True, sliver_broadcast=False)
    # the supported combinations still construct
    config.CrawlConfig(frontier_split=True, sliver_broadcast=True)
    config.CrawlConfig(frontier_split=False, sliver_broadcast=False)


def test_debug_env_read_at_construction(monkeypatch):
    # default_factory semantics: the env is consulted when the config is
    # CREATED (post-import changes take effect), and a malformed value
    # raises at construction — not at crawlspark import
    monkeypatch.delenv("CRAWLSPARK_DEBUG_INVARIANTS", raising=False)
    monkeypatch.delenv("CRAWLSPARK_DEBUG_SAMPLE", raising=False)
    assert config.CrawlConfig().debug_invariants is False

    monkeypatch.setenv("CRAWLSPARK_DEBUG_INVARIANTS", "1")
    monkeypatch.setenv("CRAWLSPARK_DEBUG_SAMPLE", "0.5")
    cfg = config.CrawlConfig()
    assert cfg.debug_invariants is True
    assert cfg.debug_sample_fraction == 0.5

    monkeypatch.setenv("CRAWLSPARK_DEBUG_SAMPLE", "not-a-float")
    with pytest.raises(ValueError):
        config.CrawlConfig()
