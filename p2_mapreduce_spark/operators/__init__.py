"""Operator surface: relational (derived), text, dedup, similarity,
multimodal — the queries SURVEY.md §2 plans, each a pure DataFrame→DataFrame
function suitable for composition and for the driver's oracle check."""
