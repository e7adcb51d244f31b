#!/usr/bin/env bash
# Fetch the released VQA v1 prepro bundles, precomputed CNN features, and the
# reference's trained snapshots, then pack the features into mmap shards for
# this framework.  Asset endpoints are those published by the reference
# release (data/get_vqa_prepro.sh, data/get_vgg16_pool5_448.sh,
# data/get_resnet_101_448.sh, experiments/*/download_trained_model.sh).
#
# Usage:  scripts/get_data.sh [prepro|vgg|resnet|snapshots|pack|coco|official|all]
# (`coco` fetches the raw COCO images for precompute-features/--image-root
# runs; not part of `all` since the feature tarballs already cover the
# reference protocol.)
set -euo pipefail

ROOT="${DATA_ROOT:-./data}"
mkdir -p "$ROOT"
cd "$ROOT"

fetch_targz() { wget -c "$1" && tar -zxvf "$(basename "$1")" && rm -f "$(basename "$1")"; }
fetch_zip()   { wget -c "$1" && unzip -o "$(basename "$1")" && rm -f "$(basename "$1")"; }

do_prepro() {
  mkdir -p VQA_prepro/data_train_val
  (cd VQA_prepro/data_train_val &&
    fetch_zip https://filebox.ece.vt.edu/~jiasenlu/codeRelease/vqaRelease/train_only/data_train_val.zip)
  (cd VQA_prepro &&
    fetch_zip https://filebox.ece.vt.edu/~jiasenlu/codeRelease/vqaRelease/train_val/data_train-val_test.zip &&
    fetch_targz http://cvlab.postech.ac.kr/research/imageqa/data/vqa_prepro/data_train-val_test-dev.tar.gz &&
    fetch_targz http://cvlab.postech.ac.kr/research/imageqa/data/vqa_prepro/data_train_train.tar.gz &&
    fetch_targz http://cvlab.postech.ac.kr/research/imageqa/data/vqa_prepro/comprehend.tar.gz)
}

do_vgg() {
  fetch_targz http://cvlab.postech.ac.kr/~hyeonwoonoh/research/imageqa/data/vqa_VGG16Conv_pool5_448.tar.gz
}

do_resnet() {
  fetch_targz http://cvlab.postech.ac.kr/~hyeonwoonoh/research/imageqa/data/vqa_resnet_101_convfeat_448.tar.gz
}

do_snapshots() {
  # reference trained models (golden outputs for checkpoint-parity tests);
  # per-experiment tarball names exactly as published
  # (experiments/*/download_trained_model.sh)
  BASE="http://cvlab.postech.ac.kr/~hyeonwoonoh/research/imageqa/2016_NIPS"
  # one subdir per experiment: SS and MS share a tarball basename
  fetch_snapshot() {
    mkdir -p "snapshots/$1"
    (cd "snapshots/$1" && fetch_targz "$BASE/$1/$2")
  }
  fetch_snapshot Ours_SS save_result_vqa_448_test-dev2015.tar.gz || true
  fetch_snapshot Ours_MS save_result_vqa_448_test-dev2015.tar.gz || true
  fetch_snapshot Ours_Full save_result_vqa_test-dev2015.tar.gz || true
  fetch_snapshot Ours_ResNet save_result_vqa_resnet101_448_test-dev2015.tar.gz || true
}

do_official() {
  # official VQA v1 release JSONs (visualqa.org, "v1 Real Images"):
  # the inputs to `rau-vqa prepro` (build the bundle WITHOUT the released
  # prepro downloads) and `rau-vqa vqa-accuracy` / --official-anno
  # (score submissions locally with the eval server's metric)
  mkdir -p vqa_official
  (cd vqa_official &&
    fetch_zip https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/Annotations_Train_mscoco.zip &&
    fetch_zip https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/Annotations_Val_mscoco.zip &&
    fetch_zip https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/Questions_Train_mscoco.zip &&
    fetch_zip https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/Questions_Val_mscoco.zip &&
    fetch_zip https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/Questions_Test_mscoco.zip)
}

do_coco() {
  # raw COCO images (VQA v1 uses train2014/val2014/test2015) — the input
  # to `rau-vqa precompute-features` / `--image-root` from-pixels runs;
  # the reference never provisioned these (it consumed feature tarballs)
  mkdir -p coco_images
  (cd coco_images &&
    fetch_zip http://images.cocodataset.org/zips/train2014.zip &&
    fetch_zip http://images.cocodataset.org/zips/val2014.zip &&
    fetch_zip http://images.cocodataset.org/zips/test2015.zip)
}

do_pack() {
  cd ..
  python -m rau_vqa_tpu.cli pack-features \
    --feat-dir "$ROOT/vqa_VGG16Conv_pool5_448/feat_448x448" \
    --vqa-dir "$ROOT/VQA_prepro/data_train_val" \
    --out "$ROOT/packed_vgg448" --cnnout-dim 512 --cnnout-w 14 --cnnout-h 14
}

case "${1:-all}" in
  prepro)    do_prepro ;;
  vgg)       do_vgg ;;
  resnet)    do_resnet ;;
  snapshots) do_snapshots ;;
  pack)      do_pack ;;
  coco)      do_coco ;;
  official)  do_official ;;
  all)       do_prepro; do_vgg; do_resnet; do_snapshots; do_pack ;;
  *) echo "usage: $0 [prepro|vgg|resnet|snapshots|pack|coco|official|all]" >&2; exit 1 ;;
esac
