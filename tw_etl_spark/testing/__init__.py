"""Engine testing utilities: the seeded differential query generator
(`relgen`) used by tests/test_differential_fuzz.py and
tools/fuzz_sweep.py."""
