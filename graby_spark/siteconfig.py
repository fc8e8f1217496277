"""Five-filters site-config rule engine, compiled for Spark broadcast.

Reimplements the reference's ruleset semantics from scratch:
  * line parser          — ConfigBuilder.php:298-361 (``command: value``,
    ``replace_string(find): repl``, ``http_header(name): v``,
    ``wrap_in(tag): xpath`` with tag whitelist blockquote/p/div,
    ``strip_attr`` alias, ``if_page_contains``, find/replace mismatch reset)
  * merge                — ConfigBuilder.php:240-291 (list union-append with
    array_unique, scalar only-if-null, http_header current-wins,
    find/replace pair dedupe keyed by find)
  * host lookup          — ConfigBuilder.php:170-230 (exact then wildcard
    ``.rest.of.host``; host sanity regex; 200-char cap) with key
    normalization lowercase + strip ``www.`` (:394-402)
  * global.txt fallback  — ConfigBuilder.php:144-152, 220-227
  * fingerprints         — ContentExtractor.php:60-69 + defaults
    ContentExtractorConfig.php:69-76

In Spark terms the compiled ruleset is the small dimension side of a
broadcast hash join: the driver parses every ``*.txt`` once, the dict is
``sc.broadcast`` to executors, and each Arrow batch probes it by normalized
hostname (two-key probe: exact then wildcard), plus a second content-keyed
probe for fingerprints.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

__all__ = [
    "SiteConfig",
    "parse_lines",
    "merge_config",
    "RuleSet",
    "load_ruleset",
    "host_key",
    "FINGERPRINTS",
]

_MULTI_COMMANDS = (
    "title",
    "body",
    "strip",
    "strip_id_or_class",
    "strip_image_src",
    "single_page_link",
    "next_page_link",
    "test_url",
    "find_string",
    "replace_string",
    "login_extra_fields",
    "native_ad_clue",
    "date",
    "author",
    "post_strip_attr",
)
_BOOL_COMMANDS = ("tidy", "prune", "autodetect_on_failure", "requires_login", "skip_json_ld")
_STRING_COMMANDS = (
    "parser",
    "login_username_field",
    "login_password_field",
    "not_logged_in_xpath",
    "login_uri",
    "src_lazy_load_attr",
)
# merge lists exclude test_url/find_string/replace_string/login_extra_fields
_MERGE_LIST_FIELDS = (
    "title",
    "body",
    "strip",
    "strip_id_or_class",
    "strip_image_src",
    "single_page_link",
    "next_page_link",
    "date",
    "author",
    "post_strip_attr",
)
_MERGE_SCALAR_FIELDS = ("tidy", "prune", "parser", "autodetect_on_failure", "requires_login", "skip_json_ld")

_ACCEPTED_WRAP_IN_TAGS = ("blockquote", "p", "div")

# ConfigBuilderConfig.php:31
_HOSTNAME_RE = re.compile(r"^(([a-zA-Z0-9-]*[a-zA-Z0-9])\.)*[a-zA-Z0-9-]*[a-zA-Z0-9]$")

# ContentExtractorConfig.php:69-76 — fingerprint regex → pseudo-host
FINGERPRINTS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"<meta\s*content=(['\"])blogger(['\"])\s*name=(['\"])generator(['\"])", re.I), "fingerprint.blogspot.com"),
    (re.compile(r"<meta\s*name=(['\"])generator(['\"])\s*content=(['\"])Blogger(['\"])", re.I), "fingerprint.blogspot.com"),
    (re.compile(r"<meta\s*name=(['\"])generator(['\"])\s*content=(['\"])WordPress", re.I), "fingerprint.wordpress.com"),
    (re.compile(r"<meta\s*data-rh=(['\"])true(['\"])\s*property=(['\"])al:ios:app_name(['\"])\s*content=(['\"])Medium(['\"])", re.I), "fingerprint.medium.com"),
    (re.compile(r"<script>.*\{(['\"])de\.ippen-digital\.story\.onlineId(['\"])", re.I | re.S), "fingerprint.ippen.media"),
    (re.compile(r"<link\s*rel=(['\"])stylesheet(['\"])\s*type=(['\"])text/css(['\"])\s*href=(['\"])https://substackcdn\.com/"), "fingerprint.substack.com"),
]


@dataclass
class SiteConfig:
    """Plain, picklable ruleset record (SiteConfig.php:17-298)."""

    title: list[str] = field(default_factory=list)
    body: list[str] = field(default_factory=list)
    strip: list[str] = field(default_factory=list)
    strip_id_or_class: list[str] = field(default_factory=list)
    strip_image_src: list[str] = field(default_factory=list)
    single_page_link: list[str] = field(default_factory=list)
    next_page_link: list[str] = field(default_factory=list)
    test_url: list[str] = field(default_factory=list)
    find_string: list[str] = field(default_factory=list)
    replace_string: list[str] = field(default_factory=list)
    login_extra_fields: list[str] = field(default_factory=list)
    native_ad_clue: list[str] = field(default_factory=list)
    date: list[str] = field(default_factory=list)
    author: list[str] = field(default_factory=list)
    post_strip_attr: list[str] = field(default_factory=list)

    tidy: bool | None = None
    prune: bool | None = None
    autodetect_on_failure: bool | None = None
    requires_login: bool | None = None
    skip_json_ld: bool | None = None

    parser: str | None = None
    login_username_field: str | None = None
    login_password_field: str | None = None
    not_logged_in_xpath: str | None = None
    login_uri: str | None = None
    src_lazy_load_attr: str | None = None

    http_header: dict[str, str] = field(default_factory=dict)
    wrap_in: dict[str, str] = field(default_factory=dict)
    # rule -> {xpath_pattern: condition}
    if_page_contains: dict[str, dict[str, str]] = field(default_factory=dict)

    # defaults mirror SiteConfig.php accessors (default true / true / true,
    # skip_json_ld default false, prune default true, tidy default true)
    def tidy_enabled(self) -> bool:
        return self.tidy if self.tidy is not None else True

    def prune_enabled(self) -> bool:
        return self.prune if self.prune is not None else True

    def autodetect(self) -> bool:
        return self.autodetect_on_failure if self.autodetect_on_failure is not None else True

    def skip_json_ld_enabled(self) -> bool:
        return bool(self.skip_json_ld)

    def get_if_page_contains(self, rule: str, pattern: str) -> str | None:
        return self.if_page_contains.get(rule, {}).get(pattern)


_CMD_PAREN_RE = re.compile(r"^([a-z0-9_]+)\((.*?)\)$", re.I)
_HDR_PAREN_RE = re.compile(r"^([a-z0-9_]+)\(([a-z0-9_-]+)\)$", re.I)
_WRAP_PAREN_RE = re.compile(r"([a-z0-9_]+)\(([a-z]+)\)$", re.I)


def parse_lines(lines: list[str]) -> SiteConfig:
    """Parse five-filters ``command: value`` lines (ConfigBuilder.php:298-361)."""
    config = SiteConfig()
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(":", 1)
        if len(parts) != 2:
            continue
        val = parts[1].strip()
        command = parts[0].strip()
        if not command:
            continue
        if command == "strip_attr":
            command = "strip"

        if command in _MULTI_COMMANDS:
            getattr(config, command).append(val)
        elif command in _BOOL_COMMANDS:
            setattr(config, command, val in ("yes", "true"))
        elif command in _STRING_COMMANDS:
            setattr(config, command, val)
        elif command.endswith(")"):
            m = _CMD_PAREN_RE.match(command)
            if m and m.group(1) == "replace_string":
                config.find_string.append(m.group(2))
                config.replace_string.append(val)
                continue
            m = _HDR_PAREN_RE.match(command)
            if m and m.group(1) == "http_header":
                config.http_header[m.group(2).strip().lower()] = val
                continue
            m = _WRAP_PAREN_RE.search(command)
            if m and m.group(1) == "wrap_in" and m.group(2).lower() in _ACCEPTED_WRAP_IN_TAGS:
                config.wrap_in[m.group(2).lower()] = val
        elif command == "if_page_contains":
            _handle_if_page_contains(config, val)

    if len(config.find_string) != len(config.replace_string):
        config.find_string = []
        config.replace_string = []
    return config


def _handle_if_page_contains(config: SiteConfig, condition: str) -> None:
    # single_page_link has priority over next_page_link (ConfigBuilder.php:373-389)
    rule = None
    if config.single_page_link:
        rule = "single_page_link"
    elif config.next_page_link:
        rule = "next_page_link"
    if rule is None:
        return
    key = getattr(config, rule)[-1]
    config.if_page_contains.setdefault(rule, {})[key] = condition


def _unique_append(current: list[str], new: list[str]) -> list[str]:
    # array_unique(array_merge(...)) keeps first occurrence order
    out: list[str] = []
    seen: set[str] = set()
    for item in current + new:
        if item not in seen:
            seen.add(item)
            out.append(item)
    return out


def merge_config(current: SiteConfig, new: SiteConfig) -> SiteConfig:
    """Merge ``new`` under ``current`` (ConfigBuilder.php:240-291)."""
    for name in _MERGE_LIST_FIELDS:
        setattr(current, name, _unique_append(getattr(current, name), getattr(new, name)))

    for rule in ("single_page_link",):
        cur_cond = current.if_page_contains.get(rule)
        new_cond = new.if_page_contains.get(rule)
        if cur_cond is not None and new_cond is not None:
            merged = dict(new_cond)
            merged.update(cur_cond)
            current.if_page_contains[rule] = merged
        elif new_cond is not None:
            current.if_page_contains[rule] = dict(new_cond)

    for name in _MERGE_SCALAR_FIELDS:
        if getattr(current, name) is None:
            setattr(current, name, getattr(new, name))

    merged_headers = dict(new.http_header)
    merged_headers.update(current.http_header)
    current.http_header = merged_headers

    # find/replace pair dedupe keyed by find (later pairs win per array_merge)
    pairs: dict[str, str] = {}
    for f, r in zip(current.find_string, current.replace_string):
        pairs[f] = r
    for f, r in zip(new.find_string, new.replace_string):
        pairs[f] = r
    current.find_string = list(pairs.keys())
    current.replace_string = list(pairs.values())
    return current


def host_key(host: str) -> str:
    """lowercase + strip ``www.`` (ConfigBuilder.php:394-402)."""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    return host


def host_of_url(url: str) -> str:
    try:
        return urlsplit(url).hostname or ""
    except ValueError:
        return ""


class RuleSet:
    """Compiled, picklable ruleset corpus for ``sc.broadcast``.

    ``configs`` maps normalized host key -> raw parsed SiteConfig;
    ``for_host`` performs the exact+wildcard+global merge that the
    reference does per request (ConfigBuilder.php:120-230), memoized.
    """

    def __init__(self, configs: dict[str, SiteConfig]) -> None:
        self.configs = configs
        self._merged_cache: dict[str, SiteConfig] = {}

    def __getstate__(self):
        return {"configs": self.configs}

    def __setstate__(self, state):
        self.configs = state["configs"]
        self._merged_cache = {}

    def _lookup(self, host: str) -> SiteConfig | None:
        """Exact-then-wildcard probe (ConfigBuilder.php:170-217)."""
        host = host_key(host)
        if not host or len(host) > 200 or not _HOSTNAME_RE.match(host.lstrip(".")):
            return None
        tries = [host]
        split = host.split(".")
        if len(split) > 1:
            tries.append("." + ".".join(split[1:]))
        for key in tries:
            if key in self.configs:
                return self.configs[key]
        return None

    def for_host(self, host: str) -> SiteConfig:
        """Merged config for host (host + global fallback), like
        ConfigBuilder::buildForHost (ConfigBuilder.php:120-161)."""
        key = host_key(host)
        cached = self._merged_cache.get(key)
        if cached is not None:
            return cached
        found = self._lookup(key)
        config = _copy_config(found) if found is not None else SiteConfig()
        if config.autodetect() and "global" in self.configs:
            merge_config(config, self.configs["global"])
        self._merged_cache[key] = config
        return config

    def fingerprint_host(self, html: str) -> str | None:
        """Regex fingerprint over raw HTML → pseudo-host
        (ContentExtractor.php:60-69)."""
        for pattern, host in FINGERPRINTS:
            if pattern.search(html):
                return host
        return None

    def fingerprint_configs_have_find_string(self) -> bool:
        """True when any fingerprint pseudo-host's config carries
        find_string rules.  Cached per ruleset: lets the extract_one
        pre-replacement pass (HttpClient.php:217 analog) skip the per-page
        fingerprint regex scan in the overwhelmingly common case where no
        fingerprint config could contribute replacements anyway — the
        host-keyed (memoized) lookup then suffices."""
        cached = getattr(self, "_fp_find_string", None)
        if cached is None:
            cached = any(
                self.for_host(fp_host).find_string for _, fp_host in FINGERPRINTS
            )
            self._fp_find_string = cached
        return cached

    def for_page(self, host: str, html: str) -> SiteConfig:
        """Full join: host config + fingerprint config merge
        (ContentExtractor.php:74-101)."""
        config = self.for_host(host)
        if not config.autodetect():
            return config
        fp_host = self.fingerprint_host(html)
        if fp_host is None:
            return config
        fp_config = self.for_host(fp_host)
        config = _copy_config(config)
        merge_config(config, fp_config)
        return config


def _copy_config(config: SiteConfig) -> SiteConfig:
    import copy

    return copy.deepcopy(config)


def load_ruleset(*directories: str) -> RuleSet:
    """Driver-side compile of ``<host>.txt`` files into a RuleSet.

    Later directories win on host collision (reference loads primary folder
    first and keeps the first hit; we mirror by letting earlier dirs win).
    """
    configs: dict[str, SiteConfig] = {}
    for directory in directories:
        if not os.path.isdir(directory):
            continue
        for name in sorted(os.listdir(directory)):
            if not name.endswith(".txt"):
                continue
            key = name[:-4]
            if key != "global":
                key = host_key(key) if not key.startswith(".") else "." + host_key(key.lstrip("."))
            if key in configs:
                continue  # first directory wins
            path = os.path.join(directory, name)
            try:
                with open(path, encoding="utf-8", errors="replace") as fh:
                    lines = [ln.rstrip("\n") for ln in fh if ln.strip() != ""]
            except OSError:
                continue
            if not lines:
                continue
            configs[key] = parse_lines(lines)
    return RuleSet(configs)
