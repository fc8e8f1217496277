"""Site-config parser / merge / lookup tests, mirroring the reference's
ConfigBuilderTest (tests/SiteConfig/ConfigBuilderTest.php:19-305)."""

import os

from graby_spark.siteconfig import (
    RuleSet,
    host_key,
    load_ruleset,
    merge_config,
    parse_lines,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "site_config")


def test_parse_basic_commands():
    cfg = parse_lines(
        [
            "title: //h1",
            "body: //div",
            "strip: //nav",
            "strip_id_or_class: comments",
            "tidy: no",
            "prune: yes",
            "parser: html5lib",
            "autodetect_on_failure: false",
        ]
    )
    assert cfg.title == ["//h1"]
    assert cfg.body == ["//div"]
    assert cfg.strip == ["//nav"]
    assert cfg.strip_id_or_class == ["comments"]
    assert cfg.tidy is False and cfg.prune is True
    assert cfg.parser == "html5lib"
    assert cfg.autodetect_on_failure is False


def test_comments_and_garbage_skipped():
    cfg = parse_lines(["# comment", "", "no colon line", ": novalue", "title: //h1"])
    assert cfg.title == ["//h1"]


def test_strip_attr_alias():
    cfg = parse_lines(["strip_attr: //img/@srcset"])
    assert cfg.strip == ["//img/@srcset"]


def test_replace_string_paren_form():
    cfg = parse_lines(["replace_string(<amp-img): <img", "find_string: a", "replace_string: b"])
    assert cfg.find_string == ["<amp-img", "a"]
    assert cfg.replace_string == ["<img", "b"]


def test_find_replace_mismatch_resets():
    cfg = parse_lines(["find_string: a", "find_string: b", "replace_string: c"])
    assert cfg.find_string == [] and cfg.replace_string == []


def test_http_header():
    cfg = parse_lines(["http_header(User-Agent): Mozilla/5.2", "http_header(referer): http://x"])
    assert cfg.http_header == {"user-agent": "Mozilla/5.2", "referer": "http://x"}


def test_wrap_in_whitelist():
    cfg = parse_lines(["wrap_in(blockquote): //p", "wrap_in(script): //x"])
    assert cfg.wrap_in == {"blockquote": "//p"}


def test_if_page_contains_binding():
    cfg = parse_lines(
        [
            "single_page_link: //a[@class='print']",
            "if_page_contains: //div[@id='gate']",
            "next_page_link: //a[@class='next']",
            "if_page_contains: //div[@id='gate2']",
        ]
    )
    # single_page_link has priority for both conditions (ConfigBuilder.php:373-389)
    assert cfg.get_if_page_contains("single_page_link", "//a[@class='print']") == "//div[@id='gate2']"


def test_merge_list_union():
    a = parse_lines(["title: //h1", "strip: //nav"])
    b = parse_lines(["title: //h1", "title: //h2", "strip: //aside"])
    merge_config(a, b)
    assert a.title == ["//h1", "//h2"]
    assert a.strip == ["//nav", "//aside"]


def test_merge_scalar_only_if_null():
    a = parse_lines(["tidy: no"])
    b = parse_lines(["tidy: yes", "prune: no"])
    merge_config(a, b)
    assert a.tidy is False and a.prune is False


def test_merge_http_header_current_wins():
    a = parse_lines(["http_header(ua): A"])
    b = parse_lines(["http_header(ua): B", "http_header(referer): R"])
    merge_config(a, b)
    assert a.http_header == {"ua": "A", "referer": "R"}


def test_merge_find_replace_dedupe_by_find():
    a = parse_lines(["find_string: x", "replace_string: 1"])
    b = parse_lines(["find_string: x", "replace_string: 2", "find_string: y", "replace_string: 3"])
    merge_config(a, b)
    assert dict(zip(a.find_string, a.replace_string)) == {"x": "2", "y": "3"}


def test_merge_idempotent():
    a = parse_lines(["title: //h1", "strip: //nav", "find_string: f", "replace_string: r"])
    b = parse_lines(["title: //h2"])
    merge_config(a, b)
    once = (list(a.title), list(a.strip), list(a.find_string))
    merge_config(a, b)
    assert once == (list(a.title), list(a.strip), list(a.find_string))


def test_host_key():
    assert host_key("WWW.Example.COM") == "example.com"
    assert host_key("sub.example.com") == "sub.example.com"


def test_ruleset_wildcard_lookup():
    rs = load_ruleset(FIXTURE_DIR)
    # exact host
    assert rs.for_host("clubic.com").body
    # www. normalization
    assert rs.for_host("www.clubic.com").body
    # wildcard .wikipedia.org.txt matches en.wikipedia.org
    cfg = rs.for_host("en.wikipedia.org")
    assert cfg.title == ["//h1[@id='firstHeading']"]
    assert cfg.tidy is False
    # unknown host → default config
    assert rs.for_host("unknown.example").title == []


def test_ruleset_fixture_corpus_loaded():
    rs = load_ruleset(FIXTURE_DIR)
    # 21 files, minus the two deliberately-empty emptylines.* fixtures
    # (empty config → no config, ConfigBuilder.php:209-211)
    assert len(rs.configs) == 19
    assert ".wikipedia.org" in rs.configs
    assert "lifehacker.com.au" in rs.configs
    assert "emptylines.com" not in rs.configs
    assert rs.for_host("emptylines.com").title == []


def test_fingerprint_detection():
    rs = RuleSet({})
    html = '<meta content="blogger" name="generator">'
    assert rs.fingerprint_host(html) == "fingerprint.blogspot.com"
    html = '<meta name="generator" content="WordPress 5.0">'
    assert rs.fingerprint_host(html) == "fingerprint.wordpress.com"
    assert rs.fingerprint_host("<p>nothing</p>") is None


def test_ruleset_is_picklable():
    import pickle

    rs = load_ruleset(FIXTURE_DIR)
    rs.for_host("clubic.com")  # populate memo cache
    clone = pickle.loads(pickle.dumps(rs))
    assert clone.for_host("clubic.com").body == rs.for_host("clubic.com").body
