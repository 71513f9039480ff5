# Shared env-var plumbing for all launch scripts
# (parity with the reference's script conventions, ref scripts/train_SMB_decoder.sh:49-123):
#  - every knob is an env var with a default (`: ${var:=default}`)
#  - the tokenizer-selection cascade derives index_file / output_dir / results_file
#  - extra_args="k=v,k2=v2" expands to "--k v --k2 v2"

: ${dataset:=Toy}
: ${data_path:=./data}
: ${seed:=42}
: ${max_his_len:=20}

# tokenizer cascade: rq_kmeans | cid | rid | original | (RQ-VAE alpha/beta/epoch)
: ${rq_kmeans:=0}
: ${cid:=0}
: ${rid:=0}
: ${original:=0}
: ${alpha:=0.02}
: ${beta:=0.0001}
: ${rqvae_epoch:=0}
: ${chunk_size:=256}

tokenizer_suffix() {
    if [ "$rq_kmeans" = "1" ]; then
        echo ".index.rq-kmeans.json|rq-kmeans"
    elif [ "$cid" = "1" ]; then
        echo ".index.cid.chunk${chunk_size}.json|cid${chunk_size}"
    elif [ "$rid" = "1" ]; then
        echo ".index.rid.json|rid"
    elif [ "$original" = "1" ]; then
        echo ".index.json|original"
    else
        echo ".index.epoch${rqvae_epoch}.alpha${alpha}-beta${beta}.json|rqvae-a${alpha}-b${beta}"
    fi
}

IFS='|' read -r index_file tok_tag <<EOF
$(tokenizer_suffix)
EOF

expand_extra_args() {
    # extra_args="k=v,k2=v2" -> "--k v --k2 v2" (ref :116-123)
    if [ -n "${extra_args:-}" ]; then
        echo "$extra_args" | awk -F',' '{for (i=1;i<=NF;i++){split($i,a,"=");printf "--%s %s ",a[1],a[2]}}'
    fi
}
