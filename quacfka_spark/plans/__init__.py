"""Plan-shaping modules: the declarative equivalents of the reference's
schema-shaping mechanisms (SURVEY.md §1.3) — normalizer flattening,
custom-field injection, and named record transforms."""
