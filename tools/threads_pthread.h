/* pthread implementation of the reference's Win32 Threads.h API, for the
 * MT oracle baseline binary ONLY (test scaffolding; the framework's own
 * runtime threading is lzma_sdk_zliblike_tpu/parallel/).  Included via
 * `gcc -include`; pre-defining the include guard makes the reference's
 * Win32-only Threads.h a no-op. */
#ifndef LZT_THREADS_PTHREAD_H
#define LZT_THREADS_PTHREAD_H
#define __7Z_THREADS_H   /* neutralize reference Threads.h */

#include <pthread.h>

#include "Types.h"

#ifdef __cplusplus
extern "C" {
#endif

/* every waitable is a heap object with a kind tag so Handle_WaitObject
 * can dispatch (the Win32 API waits on generic HANDLEs) */
typedef void *LZT_HANDLE;
#ifndef LPVOID
#define LPVOID void *
#endif

WRes HandlePtr_Close(LZT_HANDLE *h);
WRes Handle_WaitObject(LZT_HANDLE h);

typedef LZT_HANDLE CThread;
#define Thread_Construct(p) *(p) = NULL
#define Thread_WasCreated(p) (*(p) != NULL)
#define Thread_Close(p) HandlePtr_Close(p)
#define Thread_Wait(p) Handle_WaitObject(*(p))
typedef unsigned THREAD_FUNC_RET_TYPE;
#define THREAD_FUNC_CALL_TYPE
#define THREAD_FUNC_DECL THREAD_FUNC_RET_TYPE THREAD_FUNC_CALL_TYPE
typedef THREAD_FUNC_RET_TYPE (THREAD_FUNC_CALL_TYPE *THREAD_FUNC_TYPE)(void *);
WRes Thread_Create(CThread *p, THREAD_FUNC_TYPE func, void *param);

typedef LZT_HANDLE CEvent;
typedef CEvent CAutoResetEvent;
typedef CEvent CManualResetEvent;
#define Event_Construct(p) *(p) = NULL
#define Event_IsCreated(p) (*(p) != NULL)
#define Event_Close(p) HandlePtr_Close(p)
#define Event_Wait(p) Handle_WaitObject(*(p))
WRes Event_Set(CEvent *p);
WRes Event_Reset(CEvent *p);
WRes ManualResetEvent_Create(CManualResetEvent *p, int signaled);
WRes ManualResetEvent_CreateNotSignaled(CManualResetEvent *p);
WRes AutoResetEvent_Create(CAutoResetEvent *p, int signaled);
WRes AutoResetEvent_CreateNotSignaled(CAutoResetEvent *p);

typedef LZT_HANDLE CSemaphore;
#define Semaphore_Construct(p) (*p) = NULL
#define Semaphore_Close(p) HandlePtr_Close(p)
#define Semaphore_Wait(p) Handle_WaitObject(*(p))
WRes Semaphore_Create(CSemaphore *p, UInt32 initCount, UInt32 maxCount);
WRes Semaphore_ReleaseN(CSemaphore *p, UInt32 num);
WRes Semaphore_Release1(CSemaphore *p);

typedef pthread_mutex_t CCriticalSection;
WRes CriticalSection_Init(CCriticalSection *p);
#define CriticalSection_Delete(p) pthread_mutex_destroy(p)
#define CriticalSection_Enter(p) pthread_mutex_lock(p)
#define CriticalSection_Leave(p) pthread_mutex_unlock(p)

#ifdef __cplusplus
}
#endif

#endif
