#!/bin/bash
# VITON-HD virtual try-on tutorial (reference examples/tutorial_viton.sh):
# dataset prep -> mask-conditioned DDPM training -> single-image inference.

set -e

JOLIGEN=${JOLIGEN:-$(cd "$(dirname "$0")/.." && pwd)}

# Prepare the dataset (zalando-hd-resized.zip from the VITON-HD release)
wget --continue https://www.dropbox.com/s/10bfat0kg4si1bu/zalando-hd-resized.zip
python3 "$JOLIGEN/scripts/preprocess_viton.py" \
    --zip-file zalando-hd-resized.zip \
    --target-dir ~/datasets/VITON-HD/ \
    --dilate 5

# Train the diffusion model (train_config.json is written automatically
# into the checkpoints dir). The config's dataroot/checkpoints_dir are
# repo-relative defaults; point them at the same $HOME locations the prep
# and inference steps use.
cd "$JOLIGEN"
python3 train.py --config_json examples/example_ddpm_viton_tutorial.json \
    --dataroot "$HOME/datasets/VITON-HD" \
    --checkpoints_dir "$HOME/checkpoints"

# Inference
mkdir -p ~/inferences
python3 scripts/gen_single_image_diffusion.py \
    --model_in_file ~/checkpoints/VITON-HD/latest_net_G_A.pth \
    --img_in ~/datasets/VITON-HD/testA/imgs/00006_00.jpg \
    --mask_in ~/datasets/VITON-HD/testA/mask/00006_00.png \
    --dir_out ~/inferences \
    --nb_samples 4 \
    --img_width 256 \
    --img_height 256
