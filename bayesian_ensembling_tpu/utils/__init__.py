"""Support: typed configs, CLI helpers, profiling, logging, compile cache, profiles."""
