#!/usr/bin/env python
"""Interactive result annotation for LTR training (role of reference
tools/annotate-results): shows results for queries, records graded relevance
judgments to a jsonl file consumable by stract_tpu.ltr."""
import argparse, json, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--endpoint", default="http://localhost:3000")
    p.add_argument("--out", default="judgments.jsonl")
    p.add_argument("queries", nargs="+")
    args = p.parse_args()
    import urllib.request
    with open(args.out, "a") as out:
        for q in args.queries:
            body = json.dumps({"query": q, "numResults": 10}).encode()
            req = urllib.request.Request(args.endpoint + "/beta/api/search", body,
                                         {"content-type": "application/json"})
            with urllib.request.urlopen(req) as r:
                pages = json.load(r).get("webpages", [])
            print(f"\n=== {q}")
            for w in pages:
                print(f"  {w['url']}\n    {w.get('title','')}")
                grade = input("    relevance 0-4 (enter=skip): ").strip()
                if grade:
                    out.write(json.dumps({"query": q, "url": w["url"], "relevance": float(grade)}) + "\n")


if __name__ == "__main__":
    main()
