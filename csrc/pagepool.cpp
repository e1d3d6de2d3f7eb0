// Native page-pool hot loops for the paged KV manager.
//
// The engine's host-side bottleneck at scale is alloc_decode: planning a
// k-step decode megastep touches L x B x k slots in Python
// (engine/kv_manager/base.py alloc_decode). This C implementation operates
// directly on the manager's numpy buffers through ctypes — the TPU-native
// equivalent of the reference keeping its slot bookkeeping in vectorized
// torch ops (reference standard.py:669-765). Python remains the fallback
// when the shared object is unavailable (build: `make -C csrc`).
//
// Layout contracts (all row-major, matching the numpy arrays):
//   free_stacks  int32 [L, cap]      per-layer free-page stacks
//   free_tops    int64 [L]           stack tops
//   page_refs    int32 [L, num_pages]
//   page_tables  int32 [L, rows, MP]
//   row_lens     int64 [L, rows]
//   upd_*        int32 [L*B*k_max]   device table-update queue out-params

#include <cstdint>

extern "C" {

// Returns 0 on success, -1 when a layer's free stack underflows (the caller
// raises the same "pool exhausted" error as the Python path).
int pagepool_alloc_decode(
    int64_t L, int64_t B, int64_t k, int64_t P, int64_t MP, int64_t cap,
    int64_t num_pages,
    int32_t* free_stacks, int64_t* free_tops, int32_t* page_refs,
    int32_t* page_tables, int64_t* row_lens, int64_t rows,
    const int32_t* row_ids,               // [B]
    int32_t* dest,                        // [L, B, k] out
    int32_t* ctx_start,                   // [L, B] out
    int32_t* upd_l, int32_t* upd_r, int32_t* upd_i, int32_t* upd_p,
    int64_t* n_upd)                       // out: number of queued updates
{
    int64_t nu = 0;
    for (int64_t l = 0; l < L; ++l) {
        int32_t* table_l = page_tables + l * rows * MP;
        int64_t* lens_l = row_lens + l * rows;
        int32_t* stack_l = free_stacks + l * cap;
        int32_t* refs_l = page_refs + l * num_pages;
        for (int64_t j = 0; j < B; ++j) {
            const int64_t row = row_ids[j];
            int64_t pos0 = lens_l[row];
            ctx_start[l * B + j] = (int32_t)pos0;
            // pages covering [pos0, pos0 + k) not yet allocated
            int64_t have = (pos0 + P - 1) / P;
            int64_t need_through = (pos0 + k - 1) / P;
            for (int64_t pi = have; pi <= need_through; ++pi) {
                if (free_tops[l] <= 0) return -1;
                int32_t page = stack_l[--free_tops[l]];
                refs_l[page] = 1;
                table_l[row * MP + pi] = page;
                upd_l[nu] = (int32_t)l;
                upd_r[nu] = (int32_t)row;
                upd_i[nu] = (int32_t)pi;
                upd_p[nu] = page;
                ++nu;
            }
            int32_t* dest_lj = dest + (l * B + j) * k;
            for (int64_t t = 0; t < k; ++t) {
                int64_t pos = pos0 + t;
                dest_lj[t] =
                    table_l[row * MP + pos / P] * (int32_t)P
                    + (int32_t)(pos % P);
            }
            lens_l[row] = pos0 + k;
        }
    }
    *n_upd = nu;
    return 0;
}

// Worst-case new pages over all layers for a k-step decode (MemoryOracle
// decode_step_cost_pages) for a batch of rows at once.
int64_t pagepool_decode_cost(
    int64_t L, int64_t B, int64_t k, int64_t P,
    const int64_t* row_lens, int64_t rows, const int32_t* row_ids)
{
    int64_t total = 0;
    for (int64_t j = 0; j < B; ++j) {
        const int64_t row = row_ids[j];
        int64_t worst = 0;
        for (int64_t l = 0; l < L; ++l) {
            int64_t len = row_lens[l * rows + row];
            int64_t have = (len + P - 1) / P;
            int64_t need = (len + k - 1) / P + 1;
            int64_t n = need - have;
            if (n > worst) worst = n;
        }
        total += worst;
    }
    return total;
}

}  // extern "C"
