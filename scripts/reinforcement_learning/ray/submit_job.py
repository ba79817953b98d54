#!/usr/bin/env python
"""Submit aggregate job(s) to Ray cluster(s) (reference
``scripts/reinforcement_learning/ray/submit_job.py``).

Cluster file format (one per line, reference-compatible):
    name: <NAME> address: http://<IP>:<PORT>

`*`-delimited aggregate jobs are matched to clusters round-robin
(``cluster_index = job_index % num_clusters``) and submitted through the Ray
job-submission API; logs are fetched after completion. Without ray installed
the jobs run locally in sequence.
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import util

parser = argparse.ArgumentParser()
parser.add_argument(
    "--config_file", type=str,
    default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cluster_configs", "clusters.txt"),
)
parser.add_argument(
    "--aggregate_jobs", nargs=argparse.REMAINDER, default=[],
    help="'*'-delimited commands; must be the LAST argument",
)
args = parser.parse_args()


def parse_clusters(path):
    clusters = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or not line.startswith("name:"):
                    continue
                parts = line.split()
                clusters.append({"name": parts[1], "address": parts[-1]})
    return clusters


def submit_to_cluster(cluster, job, ident):
    from ray import job_submission

    client = job_submission.JobSubmissionClient(cluster["address"])
    job_id = client.submit_job(entrypoint=job)
    print(f"[{ident}] submitted {job_id} to {cluster['name']}")
    import time

    while True:
        status = client.get_job_status(job_id)
        if status in ("SUCCEEDED", "FAILED", "STOPPED"):
            break
        time.sleep(10)
    print(f"[{ident}] {job_id} -> {status}")
    print(client.get_job_logs(job_id))
    return str(status)


def main():
    jobs = "*".join(args.aggregate_jobs).split("*") if args.aggregate_jobs else []
    jobs = [j for j in (s.strip() for s in jobs) if j]
    if not jobs:
        print("no --aggregate_jobs given", file=sys.stderr)
        raise SystemExit(2)
    clusters = parse_clusters(args.config_file)
    if util.ray_available() and clusters:
        with ThreadPoolExecutor() as pool:
            futures = [
                pool.submit(
                    submit_to_cluster, clusters[i % len(clusters)], job,
                    f"agg {i}",
                )
                for i, job in enumerate(jobs)
            ]
            for f in futures:
                print(f.result())
    else:
        why = "ray not installed" if not util.ray_available() else \
            f"no clusters in {args.config_file}"
        print(f"# {why}: executing aggregate jobs locally in sequence")
        for i, job in enumerate(jobs):
            print(util.execute_job(job, f"agg {i}", log_all_output=True))


if __name__ == "__main__":
    main()
