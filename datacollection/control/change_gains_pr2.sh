#!/usr/bin/env bash
# Swap arm-controller gain profiles (reference change_gains_pr2.sh, C17).
# On hardware this stopped the controllers, loaded the yaml onto the param
# server, and restarted them via pr2_controller_manager; against the
# simulated stack it points the active-gains symlink at the chosen profile,
# which mrgan_tpu.acquisition.controller reads at startup.
set -euo pipefail
cd "$(dirname "$0")"

profile="${1:-grasp}"
case "$profile" in
  grasp)    target=pr2_arm_controllers_grasp.yaml ;;
  original) target=pr2_arm_controllers_original.yaml ;;
  *) echo "usage: $0 [grasp|original]" >&2; exit 1 ;;
esac

ln -sf "$target" pr2_arm_controllers_active.yaml
echo "Active arm controller gains: $target"
