"""Sources/sinks: synthetic web generator, testdata loaders, snapshot catalog."""
