#!/usr/bin/env python
"""Launch KubeRay cluster(s) for distributed training/tuning (reference
``scripts/reinforcement_learning/ray/launch.py``).

The reference templates a GKE KubeRay manifest with GPU worker groups; this
emits the TPU equivalent — a RayCluster manifest whose worker groups request
``google.com/tpu`` chips on TPU node pools — and applies it with kubectl.
Use ``--dry_run`` to print the manifest without a cluster (the offline CI
path; kubectl/KubeRay are not in this image).
"""

import argparse
import subprocess
import sys

MANIFEST = """\
apiVersion: ray.io/v1
kind: RayCluster
metadata:
  name: {name}
spec:
  headGroupSpec:
    rayStartParams: {{}}
    template:
      spec:
        containers:
          - name: ray-head
            image: {image}
            resources:
              limits: {{cpu: "8", memory: 16Gi}}
  workerGroupSpecs:
    - groupName: tpu-workers
      replicas: {num_workers}
      rayStartParams:
        resources: '"{{\\"TPU\\": {chips_per_worker}}}"'
      template:
        spec:
          nodeSelector:
            cloud.google.com/gke-tpu-accelerator: {tpu_type}
            cloud.google.com/gke-tpu-topology: {topology}
          containers:
            - name: ray-worker
              image: {image}
              resources:
                limits:
                  google.com/tpu: {chips_per_worker}
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, default="isaaclab-tpu")
    parser.add_argument("--image", type=str, required=True,
                        help="container image with isaaclab_tpu installed")
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--chips_per_worker", type=int, default=4)
    parser.add_argument("--tpu_type", type=str, default="tpu-v5-lite-podslice")
    parser.add_argument("--topology", type=str, default="2x2")
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    manifest = MANIFEST.format(**vars(args))
    if args.dry_run:
        print(manifest)
        return
    proc = subprocess.run(
        ["kubectl", "apply", "-f", "-"], input=manifest, text=True
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
