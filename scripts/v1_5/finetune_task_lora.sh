#!/bin/bash
# LoRA task finetuning from a finished llava-v1.5-7b-m3 checkpoint
# (reference: scripts/v1_5/finetune_task_lora.sh — r=128, alpha=256,
# separate projector lr).

python -m matryoshka_mm_tpu.train.train_mem \
    --lora_enable True --lora_r 128 --lora_alpha 256 --mm_projector_lr 2e-5 \
    --model_name_or_path ${MODEL:-mucai/llava-v1.5-7b-m3} \
    --version v1 \
    --model_use finetune_v4 \
    --matryoshka_vis_token_scale 'ver=v0_numtoks=[1,9,36,144,576]' \
    --data_path ${DATA:-./playground/data/task.json} \
    --image_folder ${IMAGES:-./playground/data} \
    --image_aspect_ratio pad \
    --group_by_modality_length True \
    --mm_projector_type mlp2x_gelu \
    --mm_vision_select_layer -2 \
    --bf16 True \
    --output_dir ${OUT:-./checkpoints/llava-v1.5-7b-m3-task-lora} \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --gradient_accumulation_steps 4 \
    --learning_rate 2e-4 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 500 \
    --save_total_limit 2 \
    --model_max_length 2048 \
    --tp_size ${TP:-1}
