"""Manually register a worker with the controller
(reference llava/serve/register_worker.py)."""

from __future__ import annotations

import argparse

import requests


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller-address", required=True)
    parser.add_argument("--worker-name", required=True)
    parser.add_argument("--check-heart-beat", action="store_true")
    args = parser.parse_args(argv)

    r = requests.post(args.worker_name + "/worker_get_status")
    requests.post(args.controller_address + "/register_worker", json={
        "worker_name": args.worker_name,
        "check_heart_beat": args.check_heart_beat,
        "worker_status": r.json(),
    })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
