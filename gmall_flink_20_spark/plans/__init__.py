"""End-to-end analytic plans (benchmark/flagship queries)."""
