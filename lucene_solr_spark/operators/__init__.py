"""Solr-side operator families re-expressed as DataFrame recipes:
facets (§3.7), streaming expressions (§3.9), joins (§3.8), collectors/
grouping/collapse (§3.6), graph traversal, MoreLikeThis/significant terms.
"""
