"""Query-layer operators: predicate compiler, feeds, joins, aggregates,
windows. Everything compiles to Column expressions / DataFrame plans so
Catalyst owns optimization."""
