#!/bin/bash
# CUT + mask-semantic training starter (reference
# scripts/train_cut_semantic_mask.sh, flags updated to the current schema).
set -e
current_dir=$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)
if [ $# -ne 1 ]; then echo "Usage: $0 [dataroot]"; exit 1; fi
echo "Data root = $1"
python3 "${current_dir}/../train.py" \
    --dataroot "$1" --checkpoints_dir ./checkpoint_semantic_mask \
    --name train_1 \
    --model_type cut --train_semantic_mask --f_s_semantic_nclasses 3 \
    --data_dataset_mode unaligned_labeled_mask \
    --G_netG mobile_resnet_attn --G_attn_nb_mask_attn 10 \
    --data_crop_size 256 --data_load_size 256 --train_batch_size 1 \
    --train_G_lr 0.0002 --train_D_lr 0.0001 \
    --train_mask_out_mask --train_mask_lambda_out_mask 50 \
    --output_display_freq 100 --output_print_freq 100
