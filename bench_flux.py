"""Standalone FLUX benchmark — now part of the driver bench (see bench.py)."""
import json

from bench import bench_flux

if __name__ == "__main__":
    print(json.dumps(bench_flux()))
