"""NumPy spec-model kernels — the slow, obviously-correct normative
reference for every pixel operation [SURVEY.md §7.2: "every kernel lands
twice"].  These are the unit-test oracles for the Pallas kernels and the
correctness baseline for end-to-end MD5 tests against libaom."""
