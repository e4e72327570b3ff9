"""Sources & sinks: testdata loaders, the deterministic synthetic pages
generator (BASELINE.json input_hint shape), and output writers."""
