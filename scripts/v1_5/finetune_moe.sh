#!/bin/bash
# M3-MoE router finetune: gating-weighted LM loss + switch load balancing.
python -m matryoshka_mm_tpu.train.train_mem \
    --model_name_or_path ${MODEL:-./checkpoints/llava-v1.5-7b-m3} \
    --version v1 \
    --model_use finetune_v4 \
    --matryoshka_vis_token_scale 'ver=v0_numtoks=[1,9,36,144,576]' \
    --moe 't=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count' \
    --tune_router True \
    --router_lr 1e-4 \
    --data_path ${DATA:-./playground/data/llava_v1_5_mix665k.json} \
    --image_folder ${IMAGES:-./playground/data} \
    --image_aspect_ratio pad \
    --group_by_modality_length True \
    --bf16 True \
    --output_dir ${OUT:-./checkpoints/llava-v1.5-7b-m3-moe} \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-5 \
    --model_max_length 2048
