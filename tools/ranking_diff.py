#!/usr/bin/env python
"""Compare two ranking experiments side by side (role of reference
tools/ranking-diff): run the same queries against two API endpoints (or two
signal-coefficient sets) and show rank movements."""
import argparse, json, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def search(endpoint, query, coeffs):
    import urllib.request
    body = json.dumps({"query": query, "signal_coefficients": coeffs or {}}).encode()
    req = urllib.request.Request(endpoint + "/beta/api/search", body,
                                 {"content-type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return [w["url"] for w in json.load(r).get("webpages", [])]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--endpoint-a", default="http://localhost:3000")
    p.add_argument("--endpoint-b", default="http://localhost:3000")
    p.add_argument("--coeffs-a", default="{}")
    p.add_argument("--coeffs-b", default="{}")
    p.add_argument("queries", nargs="+")
    args = p.parse_args()
    for q in args.queries:
        a = search(args.endpoint_a, q, json.loads(args.coeffs_a))
        b = search(args.endpoint_b, q, json.loads(args.coeffs_b))
        print(f"\n=== {q}")
        for i, url in enumerate(a):
            try:
                delta = b.index(url) - i
                mark = "=" if delta == 0 else (f"↑{-delta}" if delta < 0 else f"↓{delta}")
            except ValueError:
                mark = "✗(dropped)"
            print(f"  {i+1:2d}. {mark:10s} {url}")


if __name__ == "__main__":
    main()
