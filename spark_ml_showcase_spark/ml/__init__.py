"""MLlib surface (SURVEY.md §2.11 M1-M19): the reference's core payload
re-expressed as a reusable library.

Modules: ``fixtures`` (deterministic synthetic stand-ins per FIXTURES.md
§A — the reference's real inputs are private), ``features`` (M1-M5
pipeline builders), ``ensembles`` (M6-M8 RF/GBT + CV grids),
``regressions`` (M9-M11 GLM/linear/logistic), ``recommend`` (M12-M14
ALS + KMeans cluster profiling), ``evaluate`` (M15-M19 evaluators,
DataFrame-native confusion matrix, model introspection).
"""
