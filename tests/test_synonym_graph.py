"""SynonymGraphFilter with true posLength (round-5 closure of the
flatten-lossy delta): TestSynonymGraphFilter-shaped golden vectors and
the divergence vector where the flatten and the graph disagree."""

from __future__ import annotations

from lucene_solr_spark.analysis import (
    graph_phrase_freq,
    synonym_graph,
    synonym_graph_tokens,
)


def toks(s: str):
    return [(t, i) for i, t in enumerate(s.split())]


def test_multiword_to_single():
    """'fast wi fi network' + (wi fi -> wifi)."""
    g = synonym_graph_tokens(toks("fast wi fi network"), {("wi", "fi"): ("wifi",)})
    assert g == [
        ("fast", 0, 1),
        ("wifi", 1, 2),
        ("wi", 1, 1),
        ("fi", 2, 1),
        ("network", 3, 1),
    ]


def test_single_to_multiword():
    """'fast wifi network' + (wifi -> wi fi): the multi-word output
    expands the position axis; wifi spans both inserted nodes."""
    g = synonym_graph_tokens(toks("fast wifi network"), {("wifi",): ("wi", "fi")})
    assert g == [
        ("fast", 0, 1),
        ("wifi", 1, 2),
        ("wi", 1, 1),
        ("fi", 2, 1),
        ("network", 3, 1),
    ]


def test_divergence_flatten_vs_graph():
    """THE golden divergence: doc 'dns server', rule dns -> domain name
    service. The flatten stacks all three outputs at dns's position, so
    a phrase scan over flattened positions FALSE-matches 'name server'
    (name@0, server@1 look adjacent) and MISSES 'service server'. The
    graph gets both right."""
    rules = {("dns",): ("domain", "name", "service")}
    flat = synonym_graph(toks("dns server"), rules)
    # flatten's documented lossy shape: everything stacked at position 0
    assert ("domain", 0) in flat and ("name", 0) in flat and ("service", 0) in flat
    assert ("server", 1) in flat
    # adjacency over flattened positions false-matches 'name server'
    flat_positions = {t: p for t, p in flat}
    assert flat_positions["name"] + 1 == flat_positions["server"]  # the lie

    g = synonym_graph_tokens(toks("dns server"), rules)
    assert g == [
        ("dns", 0, 3),
        ("domain", 0, 1),
        ("name", 1, 1),
        ("service", 2, 1),
        ("server", 3, 1),
    ]
    # graph path matching: the truth table
    assert graph_phrase_freq(g, ["dns", "server"]) == 1
    assert graph_phrase_freq(g, ["domain", "name", "service"]) == 1
    assert graph_phrase_freq(g, ["domain", "name", "service", "server"]) == 1
    assert graph_phrase_freq(g, ["service", "server"]) == 1
    assert graph_phrase_freq(g, ["name", "server"]) == 0  # flatten's false match
    assert graph_phrase_freq(g, ["dns", "name"]) == 0


def test_hole_contiguity_and_preservation():
    """A stopword hole both blocks a multi-word match across it and is
    preserved in the output node numbering."""
    rules = {("new", "york"): ("nyc",)}
    # hole between new(0) and york(2): no match, positions preserved
    g = synonym_graph_tokens([("new", 0), ("york", 2)], rules)
    assert g == [("new", 0, 1), ("york", 2, 1)]
    # contiguous: match, nyc spans the pair
    g2 = synonym_graph_tokens([("a", 0), ("new", 1), ("york", 2)], rules)
    assert g2 == [
        ("a", 0, 1),
        ("nyc", 1, 2),   # longer posLength emits first at a position
        ("new", 1, 1),
        ("york", 2, 1),
    ]
    assert graph_phrase_freq(g2, ["a", "nyc"]) == 1
    assert graph_phrase_freq(g2, ["a", "new", "york"]) == 1
    assert graph_phrase_freq(g2, ["a", "nyc", "york"]) == 0


def test_equal_length_rule_is_pure_stack():
    """len(input) == len(output): the graph degenerates to the stack the
    flatten produces (both paths one node per token)."""
    g = synonym_graph_tokens(toks("big apple"), {("big",): ("large",)})
    assert g == [
        ("big", 0, 1),
        ("large", 0, 1),
        ("apple", 1, 1),
    ]
    assert graph_phrase_freq(g, ["large", "apple"]) == 1


def test_greedy_longest_match_and_multiple_matches():
    rules = {
        ("wi", "fi"): ("wifi",),
        ("wi", "fi", "network"): ("wlan",),
    }
    g = synonym_graph_tokens(toks("fast wi fi network down"), rules)
    # longest rule wins: wlan spans 3, wifi rule not applied
    assert ("wlan", 1, 3) in g
    assert all(t != "wifi" for t, _, _ in g)
    assert graph_phrase_freq(g, ["fast", "wlan", "down"]) == 1
    assert graph_phrase_freq(g, ["fast", "wi", "fi", "network", "down"]) == 1


def test_phrase_freq_counts_multiple_occurrences():
    rules = {("dns",): ("domain", "name", "service")}
    g = synonym_graph_tokens(toks("dns x dns"), rules)
    assert graph_phrase_freq(g, ["domain", "name", "service"]) == 2
