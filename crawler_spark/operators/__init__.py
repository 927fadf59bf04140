"""Engine operators: seen-set, politeness, routing, frontier rounds,
dedup, similarity, text analysis, exports."""
