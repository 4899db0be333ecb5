"""Test/bench utilities: synthetic genome, assembly, and read simulation."""
