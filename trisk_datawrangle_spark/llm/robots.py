"""robots.txt parsing and crawl-frontier matching (RFC 9309) — the
politeness gate every crawl scheduler runs between link discovery
(x50's frontier) and the fetch queue: a URL only enters the queue if
the origin host's robots.txt allows it for our product token.

Stdlib-only, spec-driven (RFC 9309, "Robots Exclusion Protocol"):

* **Group selection** (§2.2.1): a group is one or more ``User-agent``
  lines followed by rules; several agent lines may stack onto the
  same group. The crawler obeys the group(s) whose agent token
  matches its own product token case-insensitively and EXACTLY; the
  ``*`` groups apply only when no specific group matched. Matching
  groups merge. A group-selection bug is catastrophic in both
  directions (obeying another crawler's ``Disallow: /`` silences the
  whole host; missing your own block is a compliance breach), so the
  x51 fixture gives every host a decoy ``otherbot`` group with
  ``Disallow: /``.
* **Rule matching** (§2.2.2): a rule path is a literal octet prefix
  plus two metacharacters — ``*`` (any octet run) and a trailing
  ``$`` (end anchor). The most specific match wins, specificity =
  octet length of the rule path as written; on an allow/disallow tie
  ``Allow`` wins. No matching rule → allowed. Empty rule paths are
  ignored (``Disallow:`` with nothing = allow all, the historical
  idiom).
* **Lexing** (§2.1): lines split on CR/LF, ``#`` starts a comment,
  directive names are case-insensitive, unknown directives
  (``Crawl-delay``, ``Sitemap``) are ignored — rules after one still
  belong to the open group, but agent lines stack onto a group only
  when adjacent (any other line in between starts a new group on the
  next ``User-agent``, the de-facto reference-parser behavior).

The parser returns plain ``(verb, path)`` rules so the Spark side
stays declarative: rules become a tiny per-host DataFrame (a
broadcast-joinable dimension — a robots file is ~KB and one per
host, dwarfed by any frontier), the prefix/wildcard match compiles
to an anchored regex evaluated JVM-side (``regexp_like`` with a
per-row pattern), and the winner is one window argmax. Nothing in
the hot path is Python: at 100 TB the frontier×rules join is a
broadcast hash join keyed on host, and the argmax a partial
aggregate over (url, rule) candidates.
"""

from __future__ import annotations

import re

#: Regex metacharacters to escape when translating a rule path to a
#: regex. ``*`` is the RFC's own wildcard and is handled structurally,
#: so it is NOT in this set. ``$`` IS in the set: RFC 9309 gives it
#: meaning only as the FINAL octet of a rule path (the end anchor,
#: special-cased before the escape loop runs); anywhere else it is a
#: literal path octet and must be escaped, or a rule like
#: ``Disallow: /a$b`` would compile to ``^/a$b`` — a regex that can
#: never match in Java/RE2/Python, silently turning the rule into a
#: no-op and letting the crawler fetch disallowed URLs.
_RX_META = ".^+?()[]{}|\\$"


def rule_regex(path: str) -> str:
    """Translate an RFC 9309 rule path to an anchored regex in the
    Java∩RE2∩Python subset (the same engine-portability contract as
    text.py's shared patterns): escape literals (including mid-path
    ``$``), ``*`` → ``.*``, a trailing ``$`` → the regex end anchor.
    The regex is start-anchored (rule paths match from the first path
    octet)."""
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    out = []
    for ch in body:
        if ch in _RX_META:
            out.append("\\" + ch)
        elif ch == "*":
            out.append(".*")
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored else "")


def parse_robots(body: str, agent: str) -> list[tuple[str, str]]:
    """Parse a robots.txt body and return the merged rule list that
    applies to ``agent`` (our product token): ``[(verb, path), ...]``
    with verb in ``{"allow", "disallow"}``, fixture order preserved.

    Implements RFC 9309 group selection: specific-token groups beat
    ``*`` groups; several matching groups merge; agent tokens match
    case-insensitively and exactly. Rules before any ``User-agent``
    line, rules with empty paths, and unknown directives are ignored.
    Never raises on text input — a malformed line is skipped, not
    fatal (robots.txt in the wild is full of typos, and a crawler
    that crashes on one is worse than one that skips it)."""
    agent_lc = agent.lower()
    # groups: list of (set_of_agent_tokens, [(verb, path), ...])
    groups: list[tuple[set, list]] = []
    open_agents: set | None = None  # agent lines stacking onto a group
    for raw in re.split(r"\r\n|\r|\n", body):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue  # malformed line: skipped, group state unchanged
        name, _, value = line.partition(":")
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not value:
                continue
            if open_agents is None:
                open_agents = {value.lower()}
                groups.append((open_agents, []))
            else:
                open_agents.add(value.lower())
            continue
        if name in ("allow", "disallow"):
            # a rule closes the agent-line stack: the next User-agent
            # starts a NEW group rather than joining this one
            if groups:
                groups[-1][1].append((name, value))
            open_agents = None
            continue
        # unknown directive (crawl-delay, sitemap, ...): the rule list
        # stays open (a later Allow/Disallow still joins this group)
        # but the agent-line stack closes, like a rule closes it
        open_agents = None
    specific = [r for agents, rules in groups if agent_lc in agents
                for r in rules]
    if any(agent_lc in agents for agents, _ in groups):
        merged = specific
    else:
        merged = [r for agents, rules in groups if "*" in agents
                  for r in rules]
    return [(v, p) for v, p in merged if p]


def robots_rules(body: str, agent: str) -> list[tuple[str, str, int, str]]:
    """``parse_robots`` + the match metadata the engine joins on:
    ``(verb, path, specificity, anchored_regex)`` per rule, where
    specificity is the RFC's octet length of the path as written
    (``*`` and ``$`` count — they are octets of the rule)."""
    return [
        (verb, path, len(path), rule_regex(path))
        for verb, path in parse_robots(body, agent)
    ]
